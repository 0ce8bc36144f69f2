"""Sequence packing for training-data assembly: the concat-and-chunk
model (all shard tokens conceptually concatenated in deterministic order,
then cut into fixed-size context windows). Each document gets the chunk id
and offset where its tokens begin — exactly what a loader needs to build
packed training examples without materializing the concatenation.

Scale shape: ONE window aggregation per shard (running token sum), no
Python, no driver state. Shards are independent — 100 TB packs as
#shards-way parallelism with a single hash shuffle; within a shard the
running sum is the only order-dependent step and Spark's window executes
it after an external sort, so shard size is disk-bounded, not RAM-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from erigon_extract_spark.operators.text import token_count


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    context_tokens: int = 2048,
    n_shards: int = 8,
    tokens_col: str | None = None,
) -> DataFrame:
    """Assign every document its packed position: shard (hash of id),
    whitespace-token count, and the chunk id / in-chunk offset of its
    first token under concat-and-chunk packing ordered by ``id_col``.

    Deterministic across runs, partitionings, and engines (the SQL oracle
    mirrors it term for term), and append-only friendly: adding documents
    with larger ids never moves existing assignments."""
    shard = (F.col(id_col) % n_shards).alias("shard")
    # tokens_col: pack under a PRECOMPUTED token count (e.g. the trained
    # BPE tokenizer's) instead of the whitespace heuristic
    if tokens_col is not None:
        toks = F.coalesce(F.col(tokens_col), F.lit(0)).cast("long")
    else:
        toks = F.coalesce(token_count(F.col(text_col)), F.lit(0)).cast("long")
    pre = df.select(F.col(id_col), shard, toks.alias("n_tokens"))
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_excl = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("__cum")
    out = pre.withColumn("__cum", cum_excl)
    return out.select(
        id_col,
        "shard",
        "n_tokens",
        F.floor(F.col("__cum") / context_tokens).alias("chunk_id"),
        (F.col("__cum") % context_tokens).alias("chunk_offset"),
    )
