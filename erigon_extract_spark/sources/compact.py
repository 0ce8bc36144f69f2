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

def file_stats(spark: SparkSession, path: str, small_rows: int = 100):
    """Per-file health report for a parquet dataset — the DETECTOR half
    of the small-file maintenance loop (compact_parquet is the fixer).

    One distributed pass: rows tagged with ``input_file_name`` and
    count-aggregated per file (shuffle = one row per file, never data-
    sized), then ranked by size. ``is_small`` marks files under
    ``small_rows`` — the streaming-sink fragmentation that turns a 100 TB
    scan into millions of open/close round trips; feed the flagged set
    to compact_parquet.

    Output: (file_rank, file_name, n_rows, is_small), rank by
    (n_rows desc, name) so the report is deterministic.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    per_file = (
        spark.read.parquet(path)
        .withColumn("__file", F.input_file_name())
        .groupBy("__file")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.regexp_extract("__file", "([^/]+)$", 1).alias("file_name"),
            "n_rows",
        )
    )
    w = Window.orderBy(F.col("n_rows").desc(), F.col("file_name"))
    return per_file.select(
        F.row_number().over(w).alias("file_rank"),
        "file_name",
        "n_rows",
        (F.col("n_rows") < small_rows).alias("is_small"),
    )

# ---------------------------------------------------------------------------
# Committed fixture for the file_stats gate: six shards with skewed row
# counts (the streaming-sink fragmentation pattern — two healthy files,
# one medium, three fragments). Deterministic names and contents so both
# engines see identical files; DuckDB reads the same directory through
# parquet_file_metadata().
# ---------------------------------------------------------------------------

from pathlib import Path as _Path

# own top-level fixture dir (NOT inside fixtures_parquet/ — that
# directory is the fixture_store sidecar, whose byte-identical
# regeneration test enumerates it exactly)
FILESTATS_DIR = (
    _Path(__file__).resolve().parent.parent.parent / "fixtures_filestats"
)

FILESTATS_SHARDS = [1000, 1000, 500, 40, 25, 10]


def ensure_filestats_fixture(path: _Path = FILESTATS_DIR) -> _Path:
    """Write the deterministic shard set if missing (pure function of
    FILESTATS_SHARDS; one int64 column so the bytes are stable)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if path.exists() and len(list(path.glob("*.parquet"))) == len(
        FILESTATS_SHARDS
    ):
        return path
    path.mkdir(parents=True, exist_ok=True)
    base = 0
    for i, n in enumerate(FILESTATS_SHARDS):
        tbl = pa.table({"doc_id": pa.array(range(base, base + n), pa.int64())})
        pq.write_table(tbl, path / f"shard{i}.parquet")
        base += n
    return path
