"""Small-file compaction: rewrite a parquet dataset into right-sized files.

Long-running ingest (streaming sinks, per-batch appends, over-parallel
writers) strews thousands of tiny files; every downstream scan then pays
per-file open/footer costs and the driver pays listing time. Compaction is
the periodic maintenance job: one read, one controlled repartition, one
write. With ``sort_cols`` the rewrite is range-partitioned and sorted
within files, so parquet row-group min/max stats become selective again —
the same reason sources/tables.py writes sorted (and what makes the
z-order layout's pruning measurable).
"""

from __future__ import annotations

import math
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    *,
    target_rows_per_file: int = 1_000_000,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite ``src`` into ``dst`` with ~target_rows_per_file rows per
    file. Returns the number of output files chosen. One count job sizes
    the output (cheap: count pushes to parquet metadata); the rewrite is a
    single pass."""
    src_r = Path(src).resolve()
    dst_r = Path(dst).resolve()
    # mode('overwrite') onto the dataset being read can fail mid-job or
    # destroy the source depending on commit timing — refuse in-place or
    # nested rewrites outright; compact into a sibling path and swap.
    if src_r == dst_r or src_r in dst_r.parents or dst_r in src_r.parents:
        raise ValueError(
            f"compact_parquet dst must not overlap src: {src_r} vs {dst_r}"
        )
    df = spark.read.parquet(src)
    n = df.count()
    n_files = max(1, math.ceil(n / target_rows_per_file))
    if sort_cols:
        from pyspark.sql import functions as F

        out = df.repartitionByRange(
            n_files, *[F.col(c) for c in sort_cols]
        ).sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dst)
    return n_files


def data_files(spark: SparkSession, path: str) -> list[str]:
    """The dataset's parquet data files (driver-side listing)."""
    return [f for f in spark.read.parquet(path).inputFiles()]
