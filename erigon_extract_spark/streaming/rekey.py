"""Streaming first-block re-keying — the W4 transform as a custom stateful
operator (``applyInPandasWithState``), the engine's incremental answer to
the reference's batch-only merge (its README discusses in-place updates as
future work, reference README.md:52-56).

Input: an append stream of decoded state updates
    (address, block, nonce, balance, incarnation, code_hash)
meaning "the account took this value AT ``block``".

Output: CLOSED version intervals
    (address, block_from, block_to, nonce, balance, incarnation, code_hash)
emitted as soon as a newer update supersedes the held version. The open
(current) version lives in the state store — one row per live address, so
state size is O(#keys) regardless of history length.

At 100 TB: the stream is partitioned by address hash (Spark handles it),
updates for one address always land in the same state partition, and
out-of-order arrival within a micro-batch is handled by sorting the batch;
cross-batch reordering is bounded by the upstream watermark.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "address binary, block_from long, block_to long, nonce long, "
    "balance binary, incarnation long, code_hash binary"
)
STATE_SCHEMA = (
    "block long, nonce long, balance binary, incarnation long, code_hash binary"
)


def _rekey_fn(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (address,) = key
    rows = pd.concat(list(pdfs), ignore_index=True).sort_values("block")
    if state.exists:
        cur_block, cur_nonce, cur_bal, cur_inc, cur_ch = state.get
    else:
        cur_block = None

    out = []
    for r in rows.itertuples(index=False):
        if cur_block is not None:
            # close the held version: effective [cur_block, r.block)
            out.append(
                (
                    address, cur_block, int(r.block), cur_nonce, cur_bal,
                    cur_inc, cur_ch,
                )
            )
        cur_block = int(r.block)
        cur_nonce = None if pd.isna(r.nonce) else int(r.nonce)
        cur_bal = None if r.balance is None else bytes(r.balance)
        cur_inc = None if pd.isna(r.incarnation) else int(r.incarnation)
        cur_ch = None if r.code_hash is None else bytes(r.code_hash)

    state.update((cur_block, cur_nonce, cur_bal, cur_inc, cur_ch))
    yield pd.DataFrame(
        out,
        columns=[
            "address", "block_from", "block_to", "nonce", "balance",
            "incarnation", "code_hash",
        ],
    )


def stream_rekey_versions(updates: DataFrame) -> DataFrame:
    """Append stream of updates → stream of closed version intervals."""
    return updates.groupBy("address").applyInPandasWithState(
        _rekey_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
