"""As-of (point-in-time) query operators.

The reference's declared query capability: "any account or storage can be
looked up at any point in block time" (reference README.md:37-41). Not code
in the reference — it is the purpose of its output file format. Here it is
a first-class operator over any versioned table.

Physical strategy: ``max_by`` aggregation (single shuffle on the key,
map-side partial aggregation) rather than a window + filter (which cannot
partial-aggregate). On a sorted/bucketed state-history table the filter on
``block_from <= B`` prunes row groups before the shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def state_at(
    df: DataFrame,
    key_cols: Sequence[str],
    version_col: str,
    as_of,
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Latest row per key with version_col <= as_of.

    Returns one row per key: key columns, the winning version, and the value
    columns from the winning row.
    """
    if value_cols is None:
        value_cols = [c for c in df.columns if c not in key_cols and c != version_col]
    filtered = df.filter(F.col(version_col) <= F.lit(as_of))
    aggs = [F.max(version_col).alias(version_col)] + [
        F.max_by(c, version_col).alias(c) for c in value_cols
    ]
    return filtered.groupBy(*key_cols).agg(*aggs)


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, attach the latest right row with
    right_time <= left_time (backward) or earliest with >= (forward),
    matching on equi-keys ``on``.

    Implementation: equi-join on keys + time inequality, then keep the best
    right match per left row via max_by/min_by over a deterministic left row
    id. For large fact-to-fact as-of joins, pre-bucket both sides on ``on``
    so the equi-join is shuffle-free; the inequality is applied as a
    post-join filter that Catalyst pushes into the join condition.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    lid = F.monotonically_increasing_id()
    lt = left.withColumn("__lid", lid)
    right_cols = [c for c in right.columns if c not in on]
    rt = right.select(
        *on, *[F.col(c).alias(f"__r_{c}") for c in right_cols]
    )
    cond = (
        F.col(f"__r_{right_time}") <= F.col(left_time)
        if direction == "backward"
        else F.col(f"__r_{right_time}") >= F.col(left_time)
    )
    joined = lt.join(rt, on=list(on), how="left")
    pick = F.max_by if direction == "backward" else F.min_by
    left_cols = [c for c in lt.columns if c != "__lid"]
    # Rows failing the time inequality contribute NULL ordering keys, which
    # max_by/min_by ignore — so every left row survives (nulls if no match).
    agg = [F.first(c, ignorenulls=False).alias(c) for c in left_cols] + [
        pick(
            F.when(cond, F.col(f"__r_{c}")), F.when(cond, F.col(f"__r_{right_time}"))
        ).alias(c)
        for c in right_cols
    ]
    return joined.groupBy("__lid").agg(*agg).drop("__lid")
