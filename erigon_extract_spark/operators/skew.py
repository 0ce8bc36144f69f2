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


def _salt_expr(
    key_cols: Sequence[str], salt_col, salt_buckets: int
) -> Column:
    """Per-row salt in [0, salt_buckets). With ``salt_col`` (any per-row-
    varying column, e.g. a unique id) the salt is DETERMINISTIC — prefer
    it whenever one exists: monotonically_increasing_id changes when
    Spark recomputes a lost shuffle partition (the FetchFailed retry
    path), and a nondeterministic partitioning expression can double-
    count or drop rows under recomputation at cluster scale. The
    mono-id fallback remains for inputs with no distinguishing column."""
    per_row = (
        salt_col if salt_col is not None else F.monotonically_increasing_id()
    )
    return F.pmod(F.hash(*key_cols, per_row), F.lit(salt_buckets))


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: dict[str, "Column | tuple[Column, object]"],
    salt_buckets: int = 16,
    salt_col: "Column | None" = None,
) -> DataFrame:
    """Two-phase aggregation: salt the key, partially aggregate per
    (key, salt), then merge. Only aggregates with a correct two-phase
    decomposition belong here.

    ``aggs`` maps output column name → either
    - a phase-1 Column whose head is one of ``sum``/``count``/``min``/
      ``max`` (the only heads whose merge can be inferred safely: count
      merges with sum, the rest with themselves), or
    - an explicit ``(phase1_column, merge)`` pair, where ``merge`` is a
      callable Column→Column for phase 2 (e.g. decompose avg yourself as a
      salted sum + salted count and divide).

    Any other phase-1 head RAISES instead of silently mis-merging — an
    ``avg`` of partial avgs or a re-collected ``collect_set`` would return
    plausible-looking wrong numbers, which is strictly worse than an error.
    """
    salted = df.withColumn(
        "__salt", _salt_expr(key_cols, salt_col, salt_buckets)
    )
    phase1_exprs: dict[str, Column] = {}
    merges: dict[str, object] = {}
    for name, spec in aggs.items():
        if isinstance(spec, tuple):
            expr, merge = spec
            if not callable(merge):
                raise TypeError(
                    f"salted_agg[{name!r}]: explicit merge must be callable"
                )
        else:
            expr, merge = spec, _infer_merge(name, spec)
        phase1_exprs[name] = expr
        merges[name] = merge
    phase1 = salted.groupBy(*key_cols, "__salt").agg(
        *[expr.alias(name) for name, expr in phase1_exprs.items()]
    )
    return phase1.groupBy(*key_cols).agg(
        *[merges[name](F.col(name)).alias(name) for name in phase1_exprs]
    )


_INFERABLE_MERGES = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def _infer_merge(name: str, expr: Column):
    """Merge aggregate for a phase-1 expression, by its head function name.
    Only decomposable heads are inferable; anything else must come with an
    explicit merge (see salted_agg docstring)."""
    s = expr._jc.toString().lower().lstrip()
    head = s.split("(", 1)[0].strip()
    fn = _INFERABLE_MERGES.get(head)
    if fn is None:
        raise ValueError(
            f"salted_agg[{name!r}]: cannot infer a two-phase merge for "
            f"phase-1 head {head!r} (expression: {s[:80]}). Pass an explicit "
            "(phase1, merge) tuple — e.g. avg = salted sum / salted count."
        )
    return fn


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 16,
    how: str = "inner",
    salt_col: "Column | None" = None,
) -> DataFrame:
    """Skewed equi-join without broadcast: salt the big side randomly,
    replicate the small side across all salt values, join on key+salt.

    Use when the small side is too large to broadcast AND the big side has
    hot keys. Cost: small side replicated salt_buckets times — cheaper than
    one straggler task holding the whole hot key.
    """
    big_salted = big.withColumn(
        "__salt", _salt_expr([], salt_col, salt_buckets)
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
