"""SparkSession factory with scale-appropriate defaults.

Local test profile runs on local[N]; the same settings (AQE, Arrow,
adaptive skew join) are the ones you would set on a 1000-executor
cluster — only master/memory differ there.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "erigon_extract_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults favor the container: local[$SPARK_GRAFT_CPUS] and shuffle
    partitions matched to cores rather than Spark's legacy 200. On a real
    cluster, pass master=None with spark-submit-provided master and a
    shuffle_partitions sized to ~2-3x total executor cores (AQE coalesces
    down at runtime, so err high).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # binary comparisons must be unsigned lexicographic (= memcmp,
        # matching the reference comparator erigon_extract.c:2102-2157);
        # Spark's BinaryType ordering is already unsigned lexicographic.
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
