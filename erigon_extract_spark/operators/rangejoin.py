"""Banded range (interval) joins expressed as bucketed equi-joins.

The reference's only range-shaped join is J3 (BlockBody -> BlockTransaction
over a generated index range, reference erigon_extract.c:1873-1965), which
`plans/txbodies.py` expresses with explode+equi-join. This module covers the
general *temporal band join* the reference's output enables ("any ... at any
point in block time", reference README.md:37-41) for event-stream analytics:
match rows whose ordering keys are within a fixed band of each other.

Scale design (100 TB): a naive band join is a theta-join -> Spark plans a
broadcast nested-loop or cartesian product, which is quadratic. Instead we
discretize the ordering key into buckets of exactly the band width; a pair
within the band is then guaranteed to land in the same or adjacent bucket,
so probing 3 buckets (via a 3-row explode on ONE side) turns the theta-join
into a pure equi-join on (key, bucket): a shuffle-partitionable hash/SMJ
that scales linearly and inherits AQE skew splitting. Each candidate pair is
produced exactly once because the build side keeps its single true bucket.

Output-cardinality contract (reader of bench sf1 ratios, start here): the
plan is linear in CANDIDATE PAIRS, and the pair count itself is a property
of the DATA, not the plan — pairs ≈ rows x (per-key temporal density x
band width). Scaling the corpus 10x at a fixed band on a fixture whose
per-key event density also grows multiplies the OUTPUT super-linearly
(~quadratically in density), so `range_interval_join`'s sf1 wall ratio
(21.9x in BENCH_full r7) tracks its output-row ratio, not a plan defect —
the same shuffle-equi plan emits every pair exactly once either way. The
bench sidecar tags the entry `output_bound` for exactly this reason; a
plan regression would show up as shuffle bytes growing faster than the
emitted pair count, which the plan test + metered probes would catch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_self_join(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    band_us: int,
    id_col: str,
) -> DataFrame:
    """All ordered pairs (a, b), a.id != b.id, sharing ``key_cols`` with
    ``|a.ts - b.ts| <= band_us`` (microseconds, inclusive — BETWEEN
    semantics). Returns the probe-side row (prefixed ``a_``) with the
    matched build-side id and timestamp (prefixed ``b_``).
    """
    ts = F.col(ts_col)
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        # unix_micros requires TIMESTAMP, and a bare NTZ→TIMESTAMP cast
        # interprets the wall clock in the SESSION timezone — under a
        # non-UTC session, pairs spanning a DST transition would get micros
        # deltas distorted by the offset change. Diffing NTZ values against
        # a fixed NTZ epoch is pure wall-clock arithmetic: timezone- and
        # DST-independent by construction.
        us = F.expr(
            f"timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ'1970-01-01 00:00:00', `{ts_col}`)"
        )
    else:
        us = F.unix_micros(ts)
    bucket = F.floor(us / F.lit(band_us))

    probe = (
        df.select(
            *[F.col(k).alias(f"a_{k}") for k in key_cols],
            F.col(id_col).alias(f"a_{id_col}"),
            us.alias("a_us"),
            F.explode(
                F.array(bucket - 1, bucket, bucket + 1)
            ).alias("probe_bucket"),
        )
    )
    build = df.select(
        *[F.col(k).alias(f"b_{k}") for k in key_cols],
        F.col(id_col).alias(f"b_{id_col}"),
        us.alias("b_us"),
        bucket.alias("build_bucket"),
    )

    cond = F.col("probe_bucket") == F.col("build_bucket")
    for k in key_cols:
        cond = cond & (F.col(f"a_{k}") == F.col(f"b_{k}"))

    return (
        probe.join(build, cond)
        .where(
            (F.abs(F.col("a_us") - F.col("b_us")) <= F.lit(band_us))
            & (F.col(f"a_{id_col}") != F.col(f"b_{id_col}"))
        )
        .drop("probe_bucket", "build_bucket")
    )
