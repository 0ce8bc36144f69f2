"""Snapshot diff: compare two versions of a keyed dataset.

The data-drop acceptance tool: before swapping a refreshed corpus/table
into a pipeline, diff it against the previous snapshot — what was added,
what disappeared, what changed in place. One full-outer join on the key
(shuffle on both sides' keys — co-locate with bucketing when the snapshots
are large and long-lived) comparing a single row fingerprint per side, so
the compare cost is independent of column count after the map pass.

Fingerprint: md5 over FIXED-WIDTH per-column tokens — each column renders
as 'n' (null) or 'v' + md5(value) (33 chars), so no value can collide with
a column boundary or with null (separator-joined renderings are injectable:
a value containing the separator shifts the boundaries). Engine-portable
for string/integer/decimal columns; float columns should be rounded/cast
by the caller first — float→string formatting is not engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def row_fingerprint(cols: list[str]) -> F.Column:
    tokens = [
        F.when(F.col(c).isNull(), F.lit("n")).otherwise(
            F.concat(F.lit("v"), F.md5(F.col(c).cast("string")))
        )
        for c in cols
    ]
    return F.md5(F.concat(*tokens))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(key..., status) with status in added | removed | changed |
    unchanged. ``compare_cols`` defaults to every shared non-key column."""
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    o = old.select(*key_cols, row_fingerprint(compare_cols).alias("__fp_old"))
    n = new.select(*key_cols, row_fingerprint(compare_cols).alias("__fp_new"))
    joined = o.join(n, key_cols, "full_outer")
    status = (
        F.when(F.col("__fp_old").isNull(), F.lit("added"))
        .when(F.col("__fp_new").isNull(), F.lit("removed"))
        .when(F.col("__fp_old") == F.col("__fp_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*key_cols, status.alias("status"))
