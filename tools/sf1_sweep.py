#!/usr/bin/env python
"""sf1 hash-gate sweep for the shuffle-heavy gate families (VERDICT r9 #4).

Every correctness row to date is sf0.01/sf0.1; sf1 (10x sf0.1, built by
tools/make_sf1.py) has only ever been BENCHED. A plan that reshuffles
10x the data can diverge in ways the small SFs mask — AQE picks a
different join strategy past the broadcast threshold, a salted merge
sees real multi-partition hot keys, a window over a range partitioning
crosses partition boundaries it never crossed at sf0.1. This sweep
hash-gates the ~20 most shuffle-intensive registered queries at sf1
through the SAME run_one used by the driver-window mirror (Spark vs
DuckDB oracle, type-tagged cell compare) and writes a driver-format
ledger to CORRECTNESS_SF1.json.

Selection rule: the gates whose SCALE.md probes show data-proportional
shuffle (transpose, state history, dedup family, curation, CMS,
sessionize, band join, salted skew, index-range join) plus the two
round-10 additions — i.e. everything where "correct at sf0.1" is the
weakest extrapolation.

Usage: python tools/sf1_sweep.py [sf1_dir] [out.json]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from run_gate import run_one  # noqa: E402

from erigon_extract_spark import queries as q  # noqa: E402
from erigon_extract_spark.session import get_spark  # noqa: E402

# the shuffle-heavy families (see module docstring for the rule)
SWEEP = [
    # erigon core: full-history transpose + rekey, incremental maintenance
    "erigon_transpose_scale",
    "erigon_state_history",
    "erigon_incremental_update",
    "erigon_chained_increments",
    "erigon_latest_state",
    "j3_index_range_join",
    # dedup family: banded LSH candidate shuffle, CC iterations,
    # blocked levenshtein, fold-key exchange, recall truth join.
    # dedup_connected_clusters re-entered the hash arm in round 11: the
    # former recursive-CTE transitive-closure oracle (O(V*E) pair set,
    # exhausted disk at 50k docs) was replaced by recursive label-set
    # propagation run to the exact fixpoint (queries._CC_LABELPROP_CTES:
    # seed LEAST(u, min nbr), flow a label to a neighbor only when
    # smaller, MIN per node == component min — no truncation guard
    # needed because the recursion adds no row once labels stabilize).
    "dedup_connected_clusters",
    "dedup_scale",
    "dedup_minhash_portable",
    "dedup_recall_eval",
    "dedup_unicode_fold",
    "dedup_lsh_then_levenshtein",
    "graph_components_star",
    # curation / text: bigram model join, full pipeline
    "curation_scale",
    "text_bigram_familiarity",
    # agg/window: sketch merge, session windows, event sessionization
    "agg_cms_heavy_hitters",
    "session_window_agg",
    "sessionize_events",
    "topk_per_group",
    # skew: salted two-phase agg + salted join vs plain oracle
    "agg_salted_skew",
    "join_salted_skew",
    # streaming-shaped batch twins: band join
    "stream_band_join_batch",
    # web graph: iterative join+agg
    "graph_pagerank_web",
    # round-10 continuation: CDC chunk-md5 exchange is data-proportional;
    # k-means partial-sum count grows with n_batches and the oracle's
    # unrolled CTEs join 64x the corpus rows — both first bind at sf1.
    "dedup_cdc_savings",
    "embedding_kmeans",
    # round-11 extension (VERDICT item 6): the r10 stragglers that were
    # both-SF green but postdated the original sweep, plus the clamped
    # CDC gate (its recursive-CTE walk oracle first meets real document
    # length distribution at sf1).
    "embedding_kmeans_assign",
    "embedding_kmeans_incremental",
    "corpus_cluster_balanced_sample",
    "erigon_ref_file_lookup",
    "dedup_cdc_chunks_clamped",
]


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/tmp/spark_graft_sf1"
    out = args[1] if len(args) > 1 else "CORRECTNESS_SF1.json"
    missing = [n for n in SWEEP if n not in q.QUERIES]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")
    spark = get_spark(app_name="sf1_sweep")
    ledger: dict[str, dict] = {}
    n_pass = n_fail = 0

    for name in SWEEP:
        t0 = time.perf_counter()
        name, ok, msg = run_one(spark, sf_dir, name)
        dt = time.perf_counter() - t0
        ledger[name] = {
            "pass": ok,
            "detail": msg if not ok else msg.strip(),
            "wall_s": round(dt, 2),
            "sf_dir": sf_dir,
        }
        n_pass += ok
        n_fail += not ok
        print(f"{'PASS' if ok else 'FAIL'} {name}: {msg}", flush=True)
    with open(out, "w") as fh:
        json.dump(ledger, fh, indent=2)
    print(f"\n{n_pass} pass, {n_fail} fail -> {out}")
    if n_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
