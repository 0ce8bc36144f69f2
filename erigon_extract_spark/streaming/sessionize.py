"""Streaming sessionization — per-event session-id assignment as a custom
stateful operator (``applyInPandasWithState``), complementing the native
``session_window`` aggregate: that op emits one row per CLOSED session,
while this one tags EVERY event with its session id as it arrives, with
ids that keep counting across micro-batches (the contract a feature
pipeline needs to join events to session features online).

State per key is two longs (last event tick, running session counter) —
O(#live keys) regardless of history length, the same envelope as the
streaming re-key operator. Ticks are integer microseconds derived
TZ-independently (operators/windows.session_tick_micros), so batch and
stream runs agree bit-for-bit with the batch ``sessionize`` operator when
events arrive in order (replay chronological batches → identical ids).

At 100 TB: the stream hash-partitions by key; out-of-order arrival within
a micro-batch is repaired by the in-batch sort; cross-batch lateness is
bounded by the upstream watermark (late events would start a fresh session
— the same trade every stateful sessionizer makes).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from erigon_extract_spark.operators.windows import session_tick_micros

OUTPUT_SCHEMA = "user_id long, event_id long, tick_micros long, session_id long"
STATE_SCHEMA = "last_tick long, last_session long"


def _make_fn(gap_us: int):
    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["tick_micros", "event_id"]
        )
        last_tick, last_session = state.get if state.exists else (None, 0)
        ids = []
        for t in rows["tick_micros"]:
            t = int(t)
            if last_tick is None or t - last_tick > gap_us:
                last_session += 1
            last_tick = t
            ids.append(last_session)
        state.update((last_tick, last_session))
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "event_id": rows["event_id"].astype("int64"),
                "tick_micros": rows["tick_micros"].astype("int64"),
                "session_id": pd.Series(ids, index=rows.index, dtype="int64"),
            }
        )

    return fn


def stream_sessionize(
    events: DataFrame,
    gap_seconds: int,
    time_col: str = "ts",
    key_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """events stream → (user_id, event_id, tick_micros, session_id) with
    ids continuing across micro-batches. Works identically on a batch
    DataFrame's rows when replayed chronologically (pinned by tests
    against the batch ``sessionize`` window operator)."""
    pre = events.select(
        F.col(key_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        session_tick_micros(events, time_col).alias("tick_micros"),
    )
    return pre.groupBy("user_id").applyInPandasWithState(
        _make_fn(int(gap_seconds) * 1_000_000),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
