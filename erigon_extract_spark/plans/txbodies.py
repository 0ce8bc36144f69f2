"""Stage B equivalent: block bodies + transactions assembly (reference
extract_txbodies erigon_extract.c:1785-1980).

The reference walks BlockBody with a cursor, RLP-decodes (tx_index,
tx_amount) per body, then cursor-seeks BlockTransaction for tx_amount
contiguous rows (erigon_extract.c:1934-1965). Declaratively that keyed
sequential scan is: explode the per-body tx-id range, equi-join the tx
table, regroup — a sort-merge join when both sides are sorted/bucketed by
tx_id, with no per-row seeks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from erigon_extract_spark.functions.decode import decode_body_rlp
from erigon_extract_spark.operators.windows import dedup_keep_first


def decode_bodies(block_bodies: DataFrame) -> DataFrame:
    """BlockBody(block, block_hash, body_rlp) → decoded (tx_index,
    tx_amount, uncles). F7 RLP kernel with bounds checks (improvement over
    the reference's "no bounds checks here", erigon_extract.c:1875-1880)."""
    dec = block_bodies.withColumn("__d", decode_body_rlp(F.col("body_rlp")))
    return dec.select(
        "block",
        "block_hash",
        F.col("__d.tx_index").alias("tx_index"),
        F.col("__d.tx_amount").alias("tx_amount"),
        F.col("__d.uncles").alias("uncles"),
        F.col("__d.decode_error").alias("decode_error"),
    )


def assemble_tx_bodies(
    block_bodies: DataFrame,
    block_transactions: DataFrame,
    dedup_forks: bool = True,
) -> DataFrame:
    """Assemble (block, tx_amount, uncles, txs[]) — reference K4 sink shape
    (erigon_extract.c:1925-1964).

    Fork blocks (duplicate block numbers with different hashes, tolerated
    by the reference at erigon_extract.c:1852-1869) resolve to the first
    body by block_hash order when dedup_forks is set.
    """
    bodies = decode_bodies(block_bodies)
    if dedup_forks:
        bodies = dedup_keep_first(bodies, ["block"], ["block_hash"])

    # 1:N index-range join (reference J3): body row references tx rows
    # [tx_index, tx_index + tx_amount). explode(sequence(...)) generates the
    # id range; the equi-join on tx_id is broadcast/SMJ per Catalyst choice.
    exploded = bodies.select(
        "block",
        "tx_amount",
        "uncles",
        F.explode_outer(
            F.when(
                F.col("tx_amount") > 0,
                F.sequence(
                    F.col("tx_index"), F.col("tx_index") + F.col("tx_amount") - 1
                ),
            )
        ).alias("tx_id"),
    )
    joined = exploded.join(block_transactions, on="tx_id", how="left")
    return (
        joined.groupBy("block")
        .agg(
            F.first("tx_amount").alias("tx_amount"),
            F.first("uncles").alias("uncles"),
            F.array_compact(
                F.array_sort(
                    F.collect_list(F.struct(F.col("tx_id"), F.col("tx_rlp")))
                ).getField("tx_rlp")
            ).alias("txs"),
        )
    )


def txbodies_stats(block_bodies: DataFrame, block_transactions: DataFrame) -> DataFrame:
    """A2 aggregates: block_count, tx_count, total tx bytes, duplicate
    (fork) block count (reference counters erigon_extract.c:1819-1820,
    1871, 1960-1972).

    Fully lazy — ONE plan, no Spark action at construction time. The fork
    duplicate count folds into the same aggregation tree (per-block counts
    → sum of over-1 marks) instead of an eager driver-side ``.count()``
    baked in as a literal, which cost an extra job per call and froze a
    stale scalar into the returned DataFrame."""
    bodies = decode_bodies(block_bodies)
    per_block = bodies.groupBy("block").agg(
        F.count("*").alias("__n_bodies"),
        F.sum("tx_amount").alias("__tx_amount_sum"),
    )
    agg = per_block.agg(
        F.count("*").alias("block_count"),
        F.sum("__tx_amount_sum").alias("tx_count"),
        F.sum(F.when(F.col("__n_bodies") > 1, 1).otherwise(0))
        .cast("long")
        .alias("fork_dup_blocks"),
    )
    tx_bytes = block_transactions.agg(
        F.sum(F.length("tx_rlp")).alias("total_tx_bytes")
    )
    return agg.crossJoin(tx_bytes).select(
        "block_count", "tx_count", "total_tx_bytes", "fork_dup_blocks"
    )
