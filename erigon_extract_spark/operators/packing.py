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
    # pmod, not %: Spark's % keeps the dividend's sign, so a negative id
    # would yield a negative shard label outside [0, n_shards)
    shard = F.pmod(F.col(id_col), F.lit(n_shards)).alias("shard")
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


def length_bucket_batches(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_tokens: int = 4096,
    n_shards: int = 8,
    tokens_col: str | None = None,
) -> DataFrame:
    """Length-bucketed dynamic batching — the NO-SPLIT packing regime
    (SFT examples, eval prompts, anything that must not cross a context
    boundary), where concat-and-chunk (``pack_sequences``) is wrong and
    the alternative is padding every batch to its longest member.

    Documents land in power-of-two length bands (band b holds
    2^b <= n_tokens < 2^(b+1), integer-exact via base-2 digit count — no
    float log2 at band boundaries), and each (band, shard) group is cut
    into batches of ``batch_tokens // 2^(b+1)`` documents by arrival
    order. Padding waste is bounded by construction: a batch is padded to
    at most 2^(b+1)-1 while every member is >= 2^b, so waste < 50% worst
    case and far less in practice; ``batch_max_tokens`` rides along so
    the loader pads to the actual batch maximum, not the band ceiling.

    Scale shape: ONE hash shuffle on (band, shard); the row_number window
    runs per (band, shard) group — sharding exists precisely so no band
    becomes a single-partition funnel at 100 TB (the corpus_shuffle_shards
    argument). Deterministic in (id, shard) alone: append-stable within a
    shard, engine-portable (the SQL oracle mirrors it term for term).

    Returns (doc_id, n_tokens, band, shard, batch_idx, batch_size,
    batch_max_tokens).
    """
    if batch_tokens < 2:
        raise ValueError("batch_tokens must be >= 2")
    if tokens_col is not None:
        toks = F.coalesce(F.col(tokens_col), F.lit(0)).cast("long")
    else:
        toks = F.coalesce(token_count(F.col(text_col)), F.lit(0)).cast("long")
    pre = df.select(
        F.col(id_col),
        F.greatest(toks, F.lit(1)).alias("n_tokens"),
        # pmod keeps shard in [0, n_shards) even for negative ids
        F.pmod(F.col(id_col), F.lit(n_shards)).alias("shard"),
    )
    # integer-exact floor(log2): base-2 digit count - 1
    band = (F.length(F.conv(F.col("n_tokens"), 10, 2)) - 1).cast("long")
    # docs per batch for this band: at least 1 even when a doc alone
    # overflows batch_tokens (the caller sees it via batch_max_tokens)
    # batch_tokens // 2^(band+1) as a pure integer shift (no float pow)
    per_batch = F.greatest(
        F.lit(1).cast("long"),
        F.call_function(
            "shiftright",
            F.lit(batch_tokens).cast("long"),
            (band + 1).cast("int"),
        ),
    )
    w = Window.partitionBy("band", "shard").orderBy(F.col(id_col).asc())
    ranked = pre.withColumn("band", band).withColumn(
        "batch_idx",
        F.floor((F.row_number().over(w) - 1) / per_batch).cast("long"),
    )
    wb = Window.partitionBy("band", "shard", "batch_idx")
    return ranked.select(
        id_col,
        "n_tokens",
        "band",
        "shard",
        "batch_idx",
        F.count("*").over(wb).alias("batch_size"),
        F.max("n_tokens").over(wb).alias("batch_max_tokens"),
    )
