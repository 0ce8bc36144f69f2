"""Z-order layout (operators/zorder.py): Morton-code correctness against a
pure-Python reference, and the actual pruning property — a 2-D box query
over z-ordered parquet must touch far fewer row groups than over a
single-column-sorted layout."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from erigon_extract_spark.operators.zorder import (
    write_zordered,
    zorder_sql,
    zvalue,
)


def _py_z(a: int, b: int) -> int:
    out = 0
    for i in range(31):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_zvalue_matches_python_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (5, 9), (2**31 - 1, 2**31 - 1),
            (123456789, 987654321)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", zvalue("a", "b").alias("z")).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _py_z(a, b), (a, b)
        assert got[(a, b)] >= 0  # stays a positive BIGINT


def test_zorder_sql_matches_spark(spark):
    import duckdb

    rows = [(5, 9), (1023, 0), (0, 1023), (314159, 271828)]
    df = spark.createDataFrame(rows, "a long, b long")
    spark_z = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", zvalue("a", "b").alias("z")).collect()
    }
    for a, b in rows:
        (duck_z,) = duckdb.sql(
            f"SELECT {zorder_sql(str(a), str(b))}"
        ).fetchone()
        assert duck_z == spark_z[(a, b)], (a, b)


@pytest.mark.parametrize("files_expected", [1])
def test_zorder_prunes_both_dimensions(spark, tmp_path, files_expected):
    """256x256 grid in ~4k-row row groups. An x-sorted layout answers
    x-filters perfectly but a filter on Y ALONE overlaps EVERY row group
    (each spans all y values); the z-ordered layout keeps y stats tight so
    the same y-strip query prunes most groups. That asymmetry — second
    dimension prunable at a small cost to the first — is the whole point
    of the layout."""
    n = 256
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    zpath, xpath = str(tmp_path / "zorder"), str(tmp_path / "xsort")
    # tiny parquet blocks -> many row groups, so stats granularity exists
    opts = {"parquet.block.size": 64 * 1024}
    write_zordered(grid, zpath, "x", "y", num_partitions=1,
                   writer_options=opts)
    (
        grid.repartitionByRange(1, "x")
        .sortWithinPartitions("x")
        .write.option("parquet.block.size", 64 * 1024)
        .mode("overwrite")
        .parquet(xpath)
    )

    def overlapping_row_groups(path, col, lo, hi):
        import glob

        total = touched = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                stats = {
                    g.column(i).path_in_schema: g.column(i).statistics
                    for i in range(g.num_columns)
                }
                total += 1
                s = stats[col]
                if s.min <= hi and s.max >= lo:
                    touched += 1
        return touched, total

    zt, ztot = overlapping_row_groups(zpath, "y", 96, 103)
    xt, xtot = overlapping_row_groups(xpath, "y", 96, 103)
    assert ztot >= 8 and xtot >= 8  # enough row groups for the claim to bite
    # x-sorted layout: y stats prune (almost) nothing — every group but at
    # most a boundary tail spans the full y range
    assert xt >= xtot - 1, (xt, xtot)
    assert zt * 2 <= ztot, (zt, ztot)  # z-ordered: most groups pruned
