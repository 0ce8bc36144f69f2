"""Shuffle/spill/GC-metered sf0.1-vs-sf1 probe for sf_dir queries —
the sf-based sibling of tools/probe_scale.py (which covers the
``scale=``-parameterized probes). Runs a named registry query at
sf0.1 and at the pyarrow-replicated 10x directory (tools/make_sf1)
and records, per point, wall time AND total shuffle read/write,
disk spill, and GC from the Spark REST stage metrics, so a
super-linear wall ratio can be attributed to the plan (shuffle
grows >10x), the memory envelope (spill appears), or the box (GC /
ambient load — metrics flat, wall not).

Usage: python tools/probe_sf.py <query> [runs_per_point]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.probe_scale import _stage_totals  # noqa: E402


def main(query: str, runs: int = 2) -> None:
    from erigon_extract_spark.queries import QUERIES
    from erigon_extract_spark.session import get_spark

    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
    if not os.path.isfile(f"{sf1}/lineitem.parquet"):
        from tools import make_sf1 as _mk

        _mk.main(sf1)

    spark = get_spark(
        app_name=f"probe_sf_{query}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4058"},
    )
    fn = QUERIES[query]
    fn(spark, sf01).count()  # warm codegen + page cache on the small point

    points = {}
    for label, d in (("sf0.1", sf01), ("sf1", sf1)):
        best, n = float("inf"), 0
        rd0, wr0, sp0, gc0 = _stage_totals(spark)
        for _ in range(runs):
            t0 = time.perf_counter()
            n = fn(spark, d).count()
            best = min(best, time.perf_counter() - t0)
        rd1, wr1, sp1, gc1 = _stage_totals(spark)
        points[label] = {
            "sec": round(best, 2),
            "rows": n,
            "shuffle_read_mb": round((rd1 - rd0) / runs / 1e6, 1),
            "shuffle_write_mb": round((wr1 - wr0) / runs / 1e6, 1),
            "disk_spill_mb": round((sp1 - sp0) / runs / 1e6, 1),
            "jvm_gc_sec": round((gc1 - gc0) / runs / 1e3, 1),
        }
        print(f"# {query} {label}: {points[label]}", file=sys.stderr)
    r = points["sf1"]["sec"] / max(points["sf0.1"]["sec"], 1e-9)
    print(json.dumps({"probe": query, "points": points, "x10_wall_ratio": round(r, 2)}))


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 2)
