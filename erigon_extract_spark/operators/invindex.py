"""Persisted inverted text index — the RETRIEVAL primitive completing the
at-rest index family next to ``build_lsh_index`` (hyperplane buckets) and
``build_ivfpq_index`` (vector cells). Part of the beyond-reference
training-data surface (SURVEY.md §2.13): decontamination sweeps, eval-doc
lookups, and boolean corpus queries all reduce to posting-list reads.

Layout at rest: posting rows ``(term, doc_id, tf)`` written PARTITIONED
BY ``bucket = pmod(xxhash64(term), n_buckets)``. A query's terms map to
buckets with the SAME hash expression (evaluated through Spark, never
re-implemented driver-side, so the routing can't drift from the layout),
and the scan is pruned to those bucket directories at planning time —
``PartitionFilters`` on ``bucket``, the reference's O(log N) seek
discipline as partitioned-columnar layout. Within a bucket the ``term``
equality predicate pushes into the parquet row-group stats.

At 100 TB: postings are one explode + one groupBy of the corpus (shuffle
∝ token count); a query reads ``terms/n_buckets`` of the index, never
the corpus. AND/OR resolution is a posting-list aggregate (count of
distinct matched terms per doc) — no joins against the corpus at all.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from erigon_extract_spark.operators.text import word_tokens

_META = "_invindex_meta.json"


# one guard, one definition: the IVFPQ index has the identical
# local-sidecar constraint — a fix there must propagate here
from erigon_extract_spark.operators.similarity import (  # noqa: E402
    _require_local_path,
)


def postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, doc_id, tf) posting rows via the engine's shared
    ``word_tokens`` tokenizer — one explode + one map-side-combined
    groupBy, shuffle volume ∝ total tokens."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(word_tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )


def build_inverted_index(
    docs: DataFrame,
    path: str,
    *,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Persist the posting table partitioned by term-hash bucket, plus a
    JSON sidecar carrying ``n_buckets`` so queries route identically.
    ``path`` must be local (see ``_require_local_path``)."""
    _require_local_path(path)
    p = postings(docs, text_col, id_col).withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets))
    )
    p.write.mode("overwrite").partitionBy("bucket").parquet(path)
    with open(os.path.join(path, _META), "w") as f:
        json.dump({"version": 1, "n_buckets": n_buckets}, f)


def query_inverted_index(
    spark,
    path: str,
    terms: list[str],
    mode: str = "and",
) -> DataFrame:
    """Docs matching ``terms``: (doc_id, n_terms, total_tf), where
    ``mode="and"`` keeps docs matching EVERY term and ``mode="any"``
    keeps docs matching at least one.

    The term→bucket mapping is evaluated through the SAME Spark
    expression the writer used (a 1-row-per-term local DataFrame — no
    driver-side hash reimplementation to drift), and the resulting
    bucket list becomes an ``isin`` partition filter: the scan touches
    only those bucket directories, visible as PartitionFilters."""
    if mode not in ("and", "any"):
        raise ValueError(f"mode must be 'and' or 'any', got {mode!r}")
    if not terms:
        raise ValueError("terms must be non-empty")
    _require_local_path(path)
    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    tdf = spark.createDataFrame([(t,) for t in terms], "term string")
    buckets = [
        r.bucket
        for r in tdf.select(
            F.pmod(F.xxhash64("term"), F.lit(meta["n_buckets"])).alias(
                "bucket"
            )
        )
        .distinct()
        .collect()
    ]
    idx = (
        spark.read.parquet(path)
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
    )
    out = idx.groupBy("doc_id").agg(
        F.countDistinct("term").alias("n_terms"),
        F.sum("tf").alias("total_tf"),
    )
    if mode == "and":
        out = out.filter(F.col("n_terms") == len(set(terms)))
    return out
