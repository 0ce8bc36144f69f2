"""Table profiling: per-column quality stats in one aggregation pass.

The ingest-side sanity report every pipeline wants before training on a
new drop: null fractions, cardinalities, value ranges — computed for ALL
columns in a SINGLE global aggregate (one job, no per-column scans). At
100 TB switch ``exact=False``: HLL sketches (approx_count_distinct)
replace exact distincts, keeping the pass shuffle-free partial-aggregable;
exact mode costs one Expand per distinct-counted column and is meant for
gate/CI scales.

Output is long-format (one row per column, scalar cells) so it composes
with thresholds/asserts downstream and hash-gates cleanly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    exact: bool = True,
) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_s, max_s) per column;
    min/max rendered as strings so heterogeneous column types share one
    output schema."""
    cols = columns or df.columns
    aggs: list[F.Column] = [F.count("*").alias("__n")]
    for c in cols:
        col = F.col(c)
        aggs.append(
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__nulls_{c}")
        )
        if exact:
            aggs.append(F.count_distinct(col).alias(f"__dist_{c}"))
        else:
            aggs.append(F.approx_count_distinct(col).alias(f"__dist_{c}"))
        aggs.append(F.min(col).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__dist_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_s"),
                F.col(f"__max_{c}").alias("max_s"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")
