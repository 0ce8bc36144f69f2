"""As-of state queries over the state_history table — the product query
surface the reference's output file exists to serve (reference
README.md:37-41: "any account or storage can be looked up at any point in
block time").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from erigon_extract_spark.operators.asof import state_at
from erigon_extract_spark.plans.transpose import KIND_ACCOUNT, KIND_STORAGE


def account_state_at(
    state_history: DataFrame, block: int, address: bytes | None = None
) -> DataFrame:
    """Account state as of ``block``: latest version with block_from <= block
    per address. With ``address`` given, the filter prunes to one key before
    any shuffle (on a sorted Parquet layout this is a row-group-pruned point
    read — the O(log N) lookup of the reference, done by column stats)."""
    df = state_history.filter(F.col("kind") == KIND_ACCOUNT)
    if address is not None:
        df = df.filter(F.col("address") == F.lit(address))
    return state_at(
        df,
        key_cols=["address"],
        version_col="block_from",
        as_of=block,
        value_cols=["nonce", "balance", "incarnation", "code_hash"],
    )


def storage_state_at(
    state_history: DataFrame,
    block: int,
    address: bytes | None = None,
    slot: bytes | None = None,
) -> DataFrame:
    """Storage state as of ``block`` per (address, incarnation, slot)."""
    df = state_history.filter(F.col("kind") == KIND_STORAGE)
    if address is not None:
        df = df.filter(F.col("address") == F.lit(address))
    if slot is not None:
        df = df.filter(F.col("slot") == F.lit(slot))
    return state_at(
        df,
        key_cols=["address", "incarnation", "slot"],
        version_col="block_from",
        as_of=block,
        value_cols=["value"],
    )
