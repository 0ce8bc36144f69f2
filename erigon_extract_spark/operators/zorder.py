"""Z-order (Morton) data layout — multi-dimensional row-group pruning.

Sorted Parquet gives O(log N) point reads on ONE key prefix (the layout
the state-history store uses). When queries filter on two independent
columns (address ranges AND block ranges; user AND time), a single-column
sort leaves the second column's min/max stats useless: every row group
spans the full range. Interleaving the bits of both keys into one Morton
code and range-sorting by it bounds each row group to a small rectangle of
the 2-D key space, so BOTH columns' parquet min/max stats prune — the same
trick Delta/Iceberg OPTIMIZE ZORDER applies, built here from pure JVM
bit-arithmetic expressions (no UDF, fully codegen'd).

31 bits per dimension: the interleaved code stays below 2^63, so it is a
plain positive BIGINT in Spark, DuckDB, and Parquet stats alike.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MASKS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)

MAX_DIM = (1 << 31) - 1


def _spread(col: Column) -> Column:
    """Spread a 31-bit non-negative int so its bits occupy even positions
    (the classic magic-mask sequence, expressible as Catalyst built-ins)."""
    x = col.cast("long").bitwiseAND(F.lit(MAX_DIM))
    for shift, mask in _MASKS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zvalue(col_a, col_b) -> Column:
    """Morton code of two non-negative 31-bit columns: a's bits on even
    positions, b's on odd. Totally ordered locality: rows close in BOTH
    dimensions are close in z — the layout key for two-column pruning."""
    a = F.col(col_a) if isinstance(col_a, str) else col_a
    b = F.col(col_b) if isinstance(col_b, str) else col_b
    return _spread(a).bitwiseOR(F.shiftleft(_spread(b), 1))


def zorder_sql(expr_a: str, expr_b: str) -> str:
    """The identical Morton arithmetic as ANSI SQL text (DuckDB oracle)."""

    def spread(e: str) -> str:
        x = f"(CAST({e} AS BIGINT) & {MAX_DIM})"
        for shift, mask in _MASKS:
            x = f"(({x} | ({x} << {shift})) & {mask})"
        return x

    return f"({spread(expr_a)} | ({spread(expr_b)} << 1))"


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    num_partitions: int | None = None,
    max_records_per_file: int = 5_000_000,
    writer_options: dict | None = None,
) -> None:
    """Write ``df`` range-partitioned and sorted by the Morton code of
    (col_a, col_b): row-group min/max stats then prune on BOTH columns.
    ``writer_options`` pass through to the parquet writer (e.g. a small
    ``parquet.block.size`` to force fine-grained row groups in tests)."""
    z = zvalue(col_a, col_b).alias("__z")
    with_z = df.withColumn("__z", z)
    if num_partitions:
        with_z = with_z.repartitionByRange(num_partitions, "__z")
    else:
        with_z = with_z.repartitionByRange("__z")
    writer = (
        with_z.sortWithinPartitions("__z")
        .drop("__z")
        .write.option("maxRecordsPerFile", max_records_per_file)
    )
    for k, v in (writer_options or {}).items():
        writer = writer.option(k, v)
    writer.mode("overwrite").parquet(path)
