#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs each headline query at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": "headline_total", "value": <sec>, "unit": "sec",
 "queries": {name: sec, ...}, "sf": <sf>}

Timing counts full execution (collect-equivalent via a count/write action),
not plan construction. Session startup, scan caching, and whole-stage-codegen
compilation are excluded: each query first runs once at sf0.001 (same plans,
tiny data), which populates the Janino/JIT code cache, then the measured run
executes at the target scale factor. This measures steady-state throughput —
the regime a long-running 100 TB job operates in, where compile time is
amortized to zero — not single-query cold latency.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# The first 17 entries are the round-1 headline set — kept stable so
# per-query times stay comparable across rounds. Entries after the marker
# are round-2 additions (flagship pipeline + new operator families);
# "value" sums ALL queries, so compare totals only over shared names.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_change",
    "q10_returned_items",
    "j3_index_range_join",
    "w4_rekey_first_block",
    "asof_state_at",
    "asof_join",
    "topk_per_group",
    "dedup_exact",
    # dedup_minhash_lsh (xxhash fast path) was deregistered in r4 — the
    # portable variant is the one registered gate path; per-query series
    # for this slot restarts at r4 (same family, md5 permutation hashes).
    "dedup_minhash_portable",
    "text_stats",
    "text_fingerprint",
    "sim_bruteforce_topk",
    "range_interval_join",
    "window_hopping_agg",
    # --- round-2 additions ---
    "erigon_state_history",
    "ref_dialect_decode",
    "session_window_agg",
    "erigon_transpose_scale",  # 3M-row synthetic transpose+rekey throughput
    "dedup_scale",  # 200k-doc synthetic minhash-LSH throughput
    # --- round-3 additions ---
    "curation_decontaminate",  # broadcast-benchmark shingle overlap
    "pack_sequences",  # concat-and-chunk packing window
    "keccak_scale",  # 200k-key batched numpy keccak throughput
    # --- late round-3 additions ---
    "dedup_substring_spans",  # strided-gram duplicate-span detection
    "text_strip_boilerplate",  # cross-doc frequent-sentence strip
    "agg_cms_heavy_hitters",  # count-min sketch build + probe
    "text_bigram_familiarity",  # two-pass corpus-LM scoring
    "curation_scale",  # 200k-doc classifier+familiarity throughput
    "text_top_terms",  # integer-exact TF-IDF keyword extraction
    # --- round-4 additions ---
    "agg_bloom_membership",  # broadcast membership sketch + probe
    "multimodal_png_scale",  # 2k-image real PNG decode+resize throughput
    # --- round-6 additions ---
    "events_ohlc_hourly",  # single-agg time-bucket OHLC rollup
    "events_interpolate_grid",  # union-and-window grid interpolation
    "events_asof_nearest",  # nearest-match as-of merge join
    "embedding_pca_invariants",  # one-pass covariance + projection
    "dedup_unicode_fold",  # pandas-UDF fold + fingerprint shuffle
    # --- round-7 additions ---
    "text_html_extract",  # zero-shuffle HTML extraction projection
    "dedup_url",  # canonicalize + one hash-agg frontier dedup
    "text_topk_ngrams",  # count agg + TakeOrderedAndProject top-50
    "graph_pagerank_web",  # links->host edges->10 integer PR iterations
    # --- round-8 additions ---
    "source_bucketed_join",  # zero-Exchange co-located bucketed SMJ
    "multimodal_video_frames",  # AVI walk + JPEG frame decode + PNG re-encode
    "corpus_route_by_language",  # lang-id + broadcast policy routing
    # --- round-9 additions ---
    "multimodal_mp4_frames",  # ISO-BMFF box walk + JPEG frame decode
    "sim_hard_negatives",  # broadcast anchor batch x corpus, label guard
    "stream_band_join_batch",  # stream-stream band join, batch-mode gate
    "sim_mmr_rerank",  # top-N candidates + bounded per-anchor MMR greedy
    "sim_recall_eval",  # LSH-vs-exact recall@10 evaluation harness
    "source_xml_documents",  # legacy-tokenizer XML ingest (fixture-bound)
    "source_warc_documents",  # WARC shard parse + quarantine (fixture-bound)
    "dedup_recall_eval",  # banded-LSH vs exact-Jaccard recall s-curve
    "maintenance_file_stats",  # per-file layout health report
    "sample_leakage_safe_split",  # content-keyed dedup-aware split
    # --- round-10 additions ---
    "erigon_chained_increments",  # base + 2 appended increments == tip
    "erigon_ref_file_lookup",  # O(log N) page binary search, no Spark scan
    "dedup_cdc_savings",  # map-only CDC chunking + chunk-store dedup report
    "embedding_kmeans_assign",  # 3 deterministic Lloyd iterations, map-only
    # --- round-11 additions ---
    "dedup_cdc_chunks_clamped",  # LBFS-clamped CDC walk, map-only
    "dedup_connected_clusters",  # CC keep-labels over the jaccard graph
]


def _idle_gate(
    threshold: float = 0.5, budget_s: float = 1500.0, poll_s: float = 20.0
) -> dict:
    """VERDICT r5 #3: the committed bench must be the IDLE bench. Wait
    (bounded) for 1-min load to drop under ``threshold`` before starting;
    the outcome rides in the JSON so a loaded run is visibly tagged
    instead of silently polluting cross-round per-query comparisons.
    SPARK_GRAFT_LOAD_GATE=0 skips the wait (still samples).

    r8 (VERDICT r7 #6): threshold 2.0 -> 0.5 and budget 600 -> 1500 s —
    the r7 gate accepted a 1.85 load and five identical-code runs then
    swung 1.4x; per-query regression signal needs a truly idle start,
    and 25 min of patience is cheaper than a noise-bound artifact."""
    samples = []
    t0 = time.monotonic()
    wait = os.environ.get("SPARK_GRAFT_LOAD_GATE", "1") != "0"
    while True:
        try:
            load1 = os.getloadavg()[0]
        except OSError:
            return {"passed": None, "samples": [], "threshold": threshold}
        samples.append(round(load1, 2))
        if load1 <= threshold or not wait or time.monotonic() - t0 > budget_s:
            gate = {
                "passed": load1 <= threshold,
                "samples": samples[-30:],
                "threshold": threshold,
                "waited_s": round(time.monotonic() - t0, 1),
            }
            if not gate["passed"]:
                print(
                    f"# WARNING: starting bench at load {load1} > "
                    f"{threshold} after {gate['waited_s']}s wait — "
                    "numbers carry co-tenant noise",
                    file=sys.stderr,
                )
            return gate
        print(
            f"# load {load1} > {threshold}; waiting for idle box "
            f"({round(budget_s - (time.monotonic() - t0))}s budget left)",
            file=sys.stderr,
        )
        time.sleep(poll_s)


def _load_now() -> list[float] | None:
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except OSError:
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    load_gate = _idle_gate()

    from erigon_extract_spark.session import get_spark
    from erigon_extract_spark import queries as q

    spark = get_spark(app_name="bench")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    # Warm the file-listing/footer caches so per-query numbers measure the
    # query, not first-touch filesystem metadata.
    for t in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    # Codegen warm-up: identical plan shapes at sf0.001 compile every
    # generated class once, so the measured runs below time execution.
    warm_dir = sf_dir.replace("sf0.1", "sf0.001").replace("sf0.01", "sf0.001")
    if warm_dir != sf_dir and os.path.isdir(warm_dir):
        for name in HEADLINE:
            try:
                q.QUERIES[name](spark, warm_dir).count()
            except Exception as exc:  # a broken warm-up must not hide in bench
                print(f"# warmup {name} failed: {exc}", file=sys.stderr)

    # min of five measured runs per query (r6; rounds 3-5 used min-of-3):
    # this box's run-to-run noise is +/-50% and worse under driver
    # co-tenancy (r3 observed a FIRST run of 9.4s settle to 1.8s warm on
    # identical code), and min-of-k is the standard steady-state
    # estimator. NOTE for cross-round comparison: rounds 1-2 published
    # single-run/min-of-2 numbers — treat sub-30% deltas against those
    # as noise.
    # Per-section load provenance (VERDICT r8 #3): the start gate can only
    # certify the FIRST second of a 40-minute run, and all three r8 runs
    # were hit by co-tenants arriving in DIFFERENT sections. Sampling the
    # 1/5/15-min load before and after each section pins which section (if
    # any) was load-hit without cross-run forensics; a hit section should
    # be re-run once before committing.
    section_loads: dict[str, dict] = {}

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))

    def _headline_pass(tag: str) -> dict[str, float]:
        sec = {"start": _load_now()}
        section_loads[tag] = sec
        during_max = 0.0
        out: dict[str, float] = {}
        for name in HEADLINE:
            fn = q.QUERIES[name]
            best, n = float("inf"), 0
            for _ in range(runs):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                n = df.count()
                best = min(best, time.perf_counter() - t0)
            out[name] = round(best, 3)
            cur = _load_now()
            if cur:
                during_max = max(during_max, cur[0])
            print(f"# {tag} {name}: {out[name]}s ({n} rows)", file=sys.stderr)
        sec["end"] = _load_now()
        sec["during_max_1min"] = round(during_max, 2)
        return out

    # Load-robust headline (VERDICT r9 #5): the start gate certifies only
    # the first second; the r9 driver artifact burned at load 7-19 AFTER
    # the gate opened at 0.46. The section now samples the 1-min load
    # after every query; if the max sample exceeds the retry threshold,
    # the whole section re-runs once (after waiting for idle again) and
    # the artifact reports the per-query MIN of the two passes — acting
    # on the provenance instead of merely explaining the noise.
    retry_threshold = float(
        os.environ.get("SPARK_GRAFT_SECTION_LOAD_RETRY", "2.0")
    )
    times = _headline_pass("headline")
    hit = section_loads["headline"]["during_max_1min"] > retry_threshold
    section_loads["headline"]["load_hit"] = hit
    if hit and os.environ.get("SPARK_GRAFT_HEADLINE_RETRY", "1") != "0":
        print(
            f"# headline section load-hit (max 1-min "
            f"{section_loads['headline']['during_max_1min']} > "
            f"{retry_threshold}); retrying once",
            file=sys.stderr,
        )
        _idle_gate(threshold=retry_threshold, budget_s=600.0)
        times2 = _headline_pass("headline_retry")
        times = {k: min(times[k], times2.get(k, times[k])) for k in times}

    # Scale curve (VERDICT r4 #2): the four synthetic throughput probes
    # re-run at 10x volume via their `scale` parameter. Each probe's
    # work is ∝ scale by construction, so ratio ≈ 10 (modulo fixed
    # per-stage overheads, which push the ratio BELOW 10 on a warm
    # session) is the linearity witness; a super-linear ratio flags a
    # plan that would not survive 100 TB. One measured run per probe —
    # the 1x side is min-of-3 from the headline loop above, and the 10x
    # plans are codegen-warm from those runs (identical shapes).
    section_loads["scale10"] = {"start": _load_now()}
    scale10: dict[str, dict] = {}
    if os.environ.get("SPARK_GRAFT_SCALE10", "1") != "0":
        for name in (
            "erigon_transpose_scale",
            "dedup_scale",
            "curation_scale",
            "multimodal_png_scale",
        ):
            try:
                # min-of-2 (same rationale as the sf1 section): identical-
                # code x10 samples measured 9s..48s late in a long session
                # — one repeat sheds the GC/page-cache tail
                x10 = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    q.QUERIES[name](spark, sf_dir, scale=10).count()
                    x10 = min(x10, round(time.perf_counter() - t0, 3))
                x1 = times.get(name)
                scale10[name] = {
                    "x1": x1,
                    "x10": x10,
                    "ratio": round(x10 / x1, 2) if x1 else None,
                }
                print(f"# scale10 {name}: {x10}s (x1={x1}s)", file=sys.stderr)
            except Exception as exc:  # a broken probe must not hide in bench
                print(f"# scale10 {name} failed: {exc}", file=sys.stderr)
                scale10[name] = {"error": str(exc)[:200]}

    # Full-headline sf1 point (VERDICT r5 #6): every headline query once
    # at 10x the data (pyarrow-replicated, key-shifted — tools/make_sf1),
    # ratio'd against the sf0.1 min. Plans are codegen-warm from the
    # loop above, so this measures data scaling, not compilation. The
    # seven fixture/synthetic-bound queries don't read the sf dir; they
    # ride along tagged sf_independent (expect ratio ~1) rather than
    # silently padding the section. SPARK_GRAFT_SF1=0 skips.
    SF_INDEPENDENT = {
        "erigon_state_history", "ref_dialect_decode",
        "erigon_transpose_scale", "dedup_scale", "keccak_scale",
        "curation_scale", "multimodal_png_scale",
        "multimodal_video_frames",  # fixed 20-doc synthetic AVI fixture
    }
    # output-bound: the band self-join's pair count is a DATA property
    # (pairs ∝ per-key density x band x rows — operators/rangejoin.py
    # docstring); sf1 grows the fixture's temporal density, so the wall
    # ratio tracks output rows, not the (linear-in-candidates) plan.
    # Tagged so the ratio summary reflects plan scaling only.
    OUTPUT_BOUND = {"range_interval_join"}
    section_loads["scale10"]["end"] = _load_now()
    section_loads["sf1"] = {"start": section_loads["scale10"]["end"]}
    sf1: dict[str, dict] = {}
    if (
        os.environ.get("SPARK_GRAFT_SF1", "1") != "0"
        and sf_dir.rstrip("/").endswith("sf0.1")
    ):
        sf1_dir = os.environ.get(
            "SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1"
        )
        try:
            if not os.path.isfile(f"{sf1_dir}/lineitem.parquet"):
                from tools import make_sf1 as _mk

                _mk.main(sf1_dir)
            for name in HEADLINE:
                # min-of-2: the r6 single-run section showed 3x
                # run-to-run swings on identical code (range_interval_
                # join 5.8s vs 17.8s; idle min-of-3 settled at 6.3s) —
                # one repeat removes the first-run GC/page-cache tail
                t1 = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    q.QUERIES[name](spark, sf1_dir).count()
                    t1 = min(t1, round(time.perf_counter() - t0, 3))
                x01 = times.get(name)
                sf1[name] = {
                    "sf0.1": x01,
                    "sf1": t1,
                    "ratio": round(t1 / x01, 2) if x01 else None,
                }
                if name in SF_INDEPENDENT:
                    sf1[name]["sf_independent"] = True
                if name in OUTPUT_BOUND:
                    sf1[name]["output_bound"] = True
                print(f"# sf1 {name}: {t1}s (sf0.1={x01}s)", file=sys.stderr)
        except Exception as exc:  # a broken sf1 section must not hide
            print(f"# sf1 section failed: {exc}", file=sys.stderr)
            sf1 = {"error": str(exc)[:200]}

    section_loads["sf1"]["end"] = _load_now()
    section_loads["compression"] = {"start": section_loads["sf1"]["end"]}

    # BASELINE.md's one quantitative size target: sorted+zstd parquet vs
    # the ad-hoc encodings on a fixed corpus (tools/measure_compression).
    try:
        from tools.measure_compression import measure

        compression = measure(spark)
    except Exception as exc:  # a broken measurement must not hide in bench
        print(f"# compression measure failed: {exc}", file=sys.stderr)
        compression = None

    section_loads["compression"]["end"] = _load_now()

    total = round(sum(times.values()), 3)
    # ambient context for cross-round comparisons: identical-code runs
    # have measured 2x total swings under co-tenant load (NOTES.md), so
    # the sampled host load rides along with every bench line
    load_avg = _load_now()
    # The driver captures only a bounded stdout TAIL; BENCH_r06.json
    # recorded "parsed": null because the full per-query sf1 section
    # outgrew that window. Split the artifact: the FINAL stdout line is a
    # compact (<2 KB) summary the driver always parses, and the complete
    # per-query scale10/sf1 detail goes to a committed sidecar file
    # (SPARK_GRAFT_BENCH_FULL, default BENCH_full_local.json).
    def _ratios(section: dict) -> list[float]:
        # fixture-bound queries ride along tagged sf_independent with
        # ratio ~1 — including them would pad the median low, the exact
        # failure mode the sf1 section's own comment forbids
        return sorted(
            v["ratio"]
            for v in section.values()
            if isinstance(v, dict)
            and isinstance(v.get("ratio"), (int, float))
            and not v.get("sf_independent")
            and not v.get("output_bound")
        )

    sf1_r, s10_r = _ratios(sf1), _ratios(scale10)
    summary = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "compression": compression,
        "load_avg": load_avg,
        "load_gate": load_gate,
        "section_loads": section_loads,
        # true median: even-length lists average the two middle elements
        # (the old upper-middle pick biased the summary high — r7 advice)
        "sf1_ratio_median": (
            round(
                (sf1_r[(len(sf1_r) - 1) // 2] + sf1_r[len(sf1_r) // 2]) / 2,
                2,
            )
            if sf1_r
            else None
        ),
        "sf1_ratio_max": round(sf1_r[-1], 2) if sf1_r else None,
        "scale10_ratio_max": round(s10_r[-1], 2) if s10_r else None,
    }
    full = dict(summary, scale10=scale10, sf1=sf1)
    full_path = os.environ.get(
        "SPARK_GRAFT_BENCH_FULL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_full_local.json"),
    )
    try:
        with open(full_path, "w") as fh:
            json.dump(full, fh, indent=1)
        print(f"# full bench detail -> {full_path}", file=sys.stderr)
    except OSError as exc:
        print(f"# full-detail write failed: {exc}", file=sys.stderr)
    line = summary_line(summary)
    if len(line) > LINE_BUDGET:
        print(
            f"# WARNING: summary line {len(line)} chars exceeds the "
            "driver-tail budget even with auxiliary fields shed; the "
            "queries map is contractual and stays",
            file=sys.stderr,
        )
    print(line)


# The driver captures only a ~2000-char tail of the output and parses
# the FINAL line; r9-r11 replaced the whole per-query map with
# {"total_only": true} once the line outgrew that window, which
# silently broke the driver's per-query comparison AND its low-core
# scaling measurement for three rounds (PERF_r11: n_common = 1). The
# queries map is the contract ("never remove or rename entries"), so
# it is NEVER dropped; instead the line is kept inside the tail by
# (a) compact JSON separators, (b) shedding the AUXILIARY fields
# (host-load provenance, compression detail, ratio summaries) in fixed
# order, and (c) as a last resort re-rounding per-query seconds to two
# decimals (10 ms granularity — an order of magnitude below this box's
# run-to-run noise). All shed detail remains in the full sidecar file.
LINE_BUDGET = 1900  # headroom under the ~2000-char driver tail
_SHED_ORDER = [
    "section_loads",
    "load_gate",
    "load_avg",
    "compression",
    "sf1_ratio_median",
    "sf1_ratio_max",
    "scale10_ratio_max",
]


def summary_line(summary: dict) -> str:
    """Render the driver-visible JSON line, never dropping ``queries``."""
    line = json.dumps(summary, separators=(",", ":"))
    for key in _SHED_ORDER:
        if len(line) <= LINE_BUDGET:
            break
        summary.pop(key, None)
        line = json.dumps(summary, separators=(",", ":"))
    if len(line) > LINE_BUDGET and "queries" in summary:
        summary["queries"] = {
            k: round(v, 2) for k, v in summary["queries"].items()
        }
        line = json.dumps(summary, separators=(",", ":"))
    return line


if __name__ == "__main__":
    main()
