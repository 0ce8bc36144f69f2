#!/usr/bin/env python
"""Write PLANS.md: formatted physical plans for representative queries,
annotated with the scale property each plan is supposed to exhibit.

Run AFTER the gate (never two Spark JVMs at once):
    python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from erigon_extract_spark import queries as q  # noqa: E402

# (query, the plan property a reviewer should find in the output)
SHOWCASE = [
    ("s2_range_scan",
     "Predicate pushdown + column pruning: PushedFilters on the scan; "
     "ReadSchema carries only referenced columns."),
    ("q5_local_supplier_volume",
     "Star join: every dimension arrives via BroadcastHashJoin; only the "
     "fact-fact join shuffles."),
    ("w4_rekey_first_block",
     "The reference's single-threaded merge as ONE range-shuffle + "
     "window: repartitionByRange then lag within partitions."),
    ("asof_state_at",
     "As-of = partial aggregation (map-side combine) before the single "
     "exchange; no window materialization."),
    ("range_interval_join",
     "Temporal band join planned as a shuffled equi-join (no "
     "CartesianProduct/BroadcastNestedLoopJoin)."),
    ("dedup_minhash_portable",
     "Minhash LSH: one shuffle to flat signatures, bucket-local pair "
     "generation — no self-join of the document table."),
    ("window_hopping_agg",
     "Hopping windows: per-event window assignment map-side, one "
     "aggregation exchange."),
    ("grouping_sets_stats",
     "GROUPING SETS: one Expand over one scan, one shuffle — not one "
     "scan per grouping list."),
    ("asof_join",
     "As-of join as the linear merge: union + side tag + running-last "
     "window; ONE hash exchange, no join node, no per-key pair blowup."),
    ("q9_product_type_profit",
     "Profit star join: part/supplier/nation dims broadcast; the "
     "lineitem-orders fact join is the only shuffled join."),
    ("q18_large_volume_customer",
     "Large-volume customers: the HAVING subquery reuses the lineitem "
     "aggregate via semi join — lineitem is scanned, aggregated and "
     "joined without a cartesian or per-row subquery."),
    ("q21_waiting_supplier",
     "EXISTS/NOT EXISTS pair compiles to LeftSemi + LeftAnti joins on "
     "l_orderkey — no nested-loop correlated execution."),
    ("erigon_state_history",
     "Flagship pipeline: Arrow-batched decode UDFs feed a broadcast "
     "recovery join, then ONE range exchange drives transpose + re-key "
     "(window reuses the partitioning)."),
    ("ref_dialect_decode",
     "Reference-format ingest: page-range tasks decode in parallel via "
     "mapInPandas — no sequential driver-side scan."),
    ("corpus_curation_keep_list",
     "End-to-end curation: exact dedup, prefix-filtered jaccard pairs, "
     "cluster resolution and split composed into one plan — no cartesian, "
     "no driver-side loops except the bounded component iterations."),
    ("sim_lsh_topk",
     "Approximate similarity: signature map pass + bucket equi-join; "
     "cosine only within buckets, never a full cross join."),
    ("dedup_substring_spans",
     "Substring-span dedup: the duplicated-gram set is aggregated then "
     "BROADCAST back onto the gram stream (no big-side join shuffle); "
     "one doc_id exchange drives the island-merge windows."),
    ("text_bigram_familiarity",
     "Train-then-score: the bigram model aggregate and the score join "
     "share the bigram hash key — partial aggregation map-side, no "
     "cartesian, corpus-linear shuffles only."),
    ("agg_cms_heavy_hitters",
     "Count-min sketch: map-side combine collapses the sketch exchange "
     "to <= depth*width cells; the probe join broadcasts the sketch."),
    ("corpus_pipeline_v2",
     "Composed curation chain: boilerplate strip, classifier filter and "
     "shuffle sharding fuse into one plan — frequent-sentence set "
     "broadcasts, per-doc aggs share the doc_id key, no cartesian."),
    ("profile_documents",
     "Profiling: every column's stats in ONE global aggregate over one "
     "scan (count_distinct Expands notwithstanding) — no per-column jobs."),
    ("agg_bloom_membership",
     "Bloom membership: k sequential BroadcastHashJoins against the "
     "word table — the probe side is never exchanged (no "
     "SortMergeJoin/ShuffledHashJoin anywhere on the probe path)."),
    ("agg_hll_distinct",
     "HyperLogLog: register aggregate map-side combines to <= m rows "
     "per group; harmonic sum is an integer aggregate — no float "
     "accumulation in the distributed reduction."),
    ("pack_length_buckets",
     "Length-bucketed batching: ONE hash exchange on (band, shard); "
     "row_number and the batch-stat windows all reuse that partitioning "
     "— no second exchange."),
    ("events_interpolate_grid",
     "Grid interpolation: samples + exploded ticks union into ONE hash "
     "exchange per key; BOTH brackets (prev/next) come from one sort — "
     "no per-tick join, no BroadcastNestedLoopJoin grid."),
    ("events_asof_nearest",
     "Nearest as-of: the same union-and-window merge as asof_join, with "
     "prev AND next brackets sharing one Exchange + Sort — O(|L|+|R|) "
     "per key, no pair materialization."),
    ("events_ohlc_hourly",
     "OHLC rollup: ONE hash aggregation, no window — open/close are "
     "struct min/max (mergeable combinators with map-side partials)."),
    ("corpus_pps_sample",
     "PPS systematic sample: two-phase scan — row cumsums bucket-local "
     "behind a hash exchange; the ONLY SinglePartition exchange feeds "
     "the bucket-TOTALS window, never rows."),
    ("embedding_pca_invariants",
     "PCA projection: eigenvector literals baked into the plan as two "
     "SQL array expressions; the per-row path is pure Catalyst HOFs — "
     "no Python, no shuffle beyond the invariant join."),
    ("text_html_extract",
     "HTML extraction: the whole operator is one Project over the scan "
     "— regexp strips + block split + transform/filter HOFs, zero "
     "exchanges, zero UDFs."),
    ("dedup_url",
     "URL dedup: canonicalization fused into the scan projection; ONE "
     "hash exchange on the canonical string with partial_count/"
     "partial_min map-side."),
    ("text_topk_ngrams",
     "Corpus top-k: map-side-combined count aggregate feeding "
     "TakeOrderedAndProject — per-partition partial top-50, never a "
     "global sort of the n-gram table."),
    ("source_bucketed_join",
     "Bucketed co-located join: both scans carry the catalog bucket "
     "spec, so the custkey SortMergeJoin runs with ZERO Exchange on "
     "either side — the only exchange in the plan is the final "
     "mktsegment aggregation."),
    ("source_partitioned_dpp",
     "Dynamic partition pruning: the fact scan's PartitionFilters "
     "contain dynamicpruningexpression(...) fed by the broadcast "
     "quarter dim — 3 of ~80 month directories read at runtime."),
    ("agg_salted_skew",
     "Salted two-phase aggregation: partial agg on (key, salt) then "
     "merge on key — two hash aggregates, each with map-side partials; "
     "no single hot-key partition."),
    ("sim_mmr_lsh",
     "MMR retrieve-then-rerank, sublinear stage 1: candidates via a "
     "BroadcastHashJoin on the LSH bucket key (no nested loop, shuffle "
     "∝ corpus); the greedy rerank is one bounded Arrow batch per "
     "anchor group behind a single anchor_id exchange."),
    ("dedup_recall_eval",
     "LSH recall evaluation: candidate arm is the banded-LSH plan; the "
     "exact-truth arm is a shingle inverted-index equi-join; the "
     "threshold dimension rides a Generate (explode) — no "
     "BroadcastNestedLoopJoin, no cartesian anywhere."),
    ("maintenance_file_stats",
     "File-level health report: input_file_name projection feeding a "
     "map-side-combined count — the exchange carries ONE row per FILE "
     "(metadata-sized), never data rows."),
    ("erigon_chained_increments",
     "In-place maintenance induction step: base + two appended "
     "increments resolve through the SAME rekey window as the full "
     "rebuild — one range exchange over the union, no per-increment "
     "re-shuffle, no join against the existing store."),
    ("dedup_cdc_savings",
     "Content-defined chunking: the chunker is ONE ArrowEvalPython/"
     "MapInPandas map stage (no Generate, no per-character explode); "
     "the savings aggregate exchanges only (source, md5, len) triples — "
     "chunk TEXT never crosses the wire."),
    ("embedding_kmeans_assign",
     "Deterministic Lloyd k-means, final-assignment pass: one MapInPandas "
     "stage over the corpus scan, ZERO Exchange — per-iteration partial "
     "sums (k x n_batches rows) are the only rows that ever leave a "
     "task, the DataFrame form of treeAggregate."),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from erigon_extract_spark.session import get_spark

    spark = get_spark(app_name="plans")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    out = [
        "# PLANS — physical-plan snapshots at sf0.1",
        "",
        "Generated by `python tools/dump_plans.py`; regenerated when plans",
        "change. Each section states the scale property the plan must show;",
        "tests/test_plan_quality.py asserts the same properties in CI.",
        "",
    ]
    for name, claim in SHOWCASE:
        df = q.QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        out += [f"## {name}", "", f"**Property:** {claim}", "",
                "```", plan.rstrip(), "```", ""]

    Path(__file__).resolve().parent.parent.joinpath("PLANS.md").write_text(
        "\n".join(out)
    )
    print(f"wrote PLANS.md ({len(SHOWCASE)} plans)")


if __name__ == "__main__":
    main()
