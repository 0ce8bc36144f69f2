"""Skew-handling utilities for hot keys.

The reference's data has a few contract addresses owning most storage rows
(the motivation for its stats at erigon_extract.c:1146-1153). AQE's skew
join handles most cases automatically (enabled in session.py); these
helpers cover the two patterns AQE can't fix:

- a skewed AGGREGATION (AQE only splits join partitions), fixed by two-phase
  salted aggregation;
- a skewed broadcast-infeasible join, fixed by explicit salt replication.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: salt the key, partially aggregate per
    (key, salt), then merge. Only SUM/COUNT/MIN/MAX-decomposable aggregates
    belong here; pass the phase-1 expression and the phase-2 merge is the
    same function over the partials.

    aggs maps output column name → phase-1 aggregate expression.
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.hash(*key_cols, F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    phase1 = salted.groupBy(*key_cols, "__salt").agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    merge = {
        name: _merge_fn(expr)(F.col(name)).alias(name) for name, expr in aggs.items()
    }
    return phase1.groupBy(*key_cols).agg(*merge.values())


def _merge_fn(expr: Column):
    """Pick the merge aggregate for a phase-1 expression by its head
    function name (sum/count merge with sum; min/max with min/max)."""
    s = expr._jc.toString().lower()
    if s.startswith("count("):
        return F.sum
    if s.startswith("min("):
        return F.min
    if s.startswith("max("):
        return F.max
    return F.sum


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join without broadcast: salt the big side randomly,
    replicate the small side across all salt values, join on key+salt.

    Use when the small side is too large to broadcast AND the big side has
    hot keys. Cost: small side replicated salt_buckets times — cheaper than
    one straggler task holding the whole hot key.
    """
    big_salted = big.withColumn(
        "__salt",
        F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt_buckets)),
    )
    small_replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = big_salted.join(small_replicated, [*on, "__salt"], how)
    return out.drop("__salt")


def key_histogram(df: DataFrame, key_cols: Sequence[str], top: int = 20) -> DataFrame:
    """Diagnostic: the heaviest keys and their row counts (what to salt)."""
    return (
        df.groupBy(*key_cols)
        .count()
        .orderBy(F.col("count").desc())
        .limit(top)
    )
