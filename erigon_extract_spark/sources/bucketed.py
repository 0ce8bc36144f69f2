"""Bucketed parquet tables — Spark's co-location primitive for 100 TB joins.

The reference engine co-locates its two big scans by writing both files in
the same key order and merging them single-threaded (erigon_extract.c's
sorted-table merge). Spark's equivalent is *bucketing*: write each table
hash-partitioned into N buckets on the join key, record the bucket spec in
the catalog, and every subsequent join or aggregation on that key runs with
ZERO shuffle — the scan's output partitioning already matches the required
distribution. At 100 TB this converts the dominant repeated cost (a
corpus-sized exchange per join per job) into a one-time write:

- **Join co-location.** Two tables bucketed INTO the same N on their join
  keys sort-merge-join with no Exchange on either side.
- **Aggregation co-location.** ``groupBy(bucket_col)`` needs no exchange —
  the partial aggregate IS the final aggregate per bucket.
- **Bucket pruning.** A point predicate on the bucket column reads 1/N of
  the files (``SelectedBucketsCount`` in the scan) — the same effect the
  reference gets from its MDBX B-tree point lookup, without an index.

Catalog lifecycle: ``df.write.bucketBy`` only works through
``saveAsTable``, and the in-memory catalog dies with the session — so this
module splits *build* (write the bucketed files once, under a throwaway
catalog name) from *register* (``CREATE TABLE ... CLUSTERED BY ... INTO N
BUCKETS LOCATION ...`` — idempotent, re-attaches the bucket spec to the
existing files in any later session). That split is exactly how external
bucketed tables over object storage work on a real cluster: the files are
the durable artifact, the DDL is cheap per-session metadata.

The writer repartitions by the bucket key first so each bucket is exactly
ONE file: Spark only trusts (and elides the sort for) ``sortBy`` metadata
when every bucket has a single file, and a non-repartitioned write emits
tasks × buckets files.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def _ident(name: str) -> str:
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
        raise ValueError(f"unsafe SQL identifier: {name!r}")
    return name


def _schema_ddl(df: DataFrame) -> str:
    return ", ".join(
        f"{_ident(f.name)} {f.dataType.simpleString()}" for f in df.schema.fields
    )


def write_bucketed(
    df: DataFrame,
    location: str,
    bucket_col: str,
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as a bucketed parquet table at ``location``.

    Uses a throwaway catalog name (bucketBy requires saveAsTable), then
    drops the metadata immediately — the durable artifact is the files;
    :func:`register_bucketed` re-attaches the spec in any session.
    """
    import os

    spark = df.sparkSession
    tmp_name = f"__bkt_build_{os.getpid()}_{abs(hash(location)) % 10**8}"
    writer = (
        df.repartition(n_buckets, bucket_col)  # one file per bucket
        .write.format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.option("path", location).mode("overwrite").saveAsTable(tmp_name)
    spark.sql(f"DROP TABLE IF EXISTS {_ident(tmp_name)}")


def register_bucketed(
    spark: SparkSession,
    name: str,
    location: str,
    schema_df: DataFrame,
    bucket_col: str,
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Idempotently attach catalog metadata (schema + bucket spec) to an
    existing bucketed-file location and return ``spark.table(name)``.

    Reading the parquet path directly would LOSE the bucket spec (and with
    it the no-shuffle property) — bucketed reads must go through the
    catalog, which is why this exists as a first-class step.
    """
    sorted_by = (
        f"SORTED BY ({', '.join(_ident(c) for c in sort_cols)})" if sort_cols else ""
    )
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {_ident(name)} ({_schema_ddl(schema_df)})
        USING parquet
        CLUSTERED BY ({_ident(bucket_col)}) {sorted_by}
        INTO {int(n_buckets)} BUCKETS
        LOCATION '{location.replace("'", "''")}'
        """
    )
    return spark.table(name)
