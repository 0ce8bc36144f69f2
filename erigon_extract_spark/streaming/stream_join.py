"""Stream-stream interval (band) join — the streaming counterpart of
``operators/rangejoin.band_self_join`` (SURVEY.md §2.12 extension).

Spark executes a watermarked stream-stream join with an event-time range
condition natively: each side buffers rows in the state store only until
the other side's watermark passes ``band + delay``, so state stays bounded
by (rate x window), independent of total history — the property that makes
this viable on an unbounded 100 TB/day feed where the batch rewrite would
re-scan everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_band_self_join(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    band_seconds: int,
    id_col: str,
    watermark_delay: str = "30 seconds",
) -> DataFrame:
    """All ordered pairs (a, b), a.id != b.id, same keys, with
    ``|a.ts - b.ts| <= band_seconds`` (inclusive), over an append stream.

    Both sides carry a watermark and the join condition bounds b.ts
    relative to a.ts in BOTH directions — the two facts Spark's
    StreamingSymmetricHashJoin needs to evict state.
    """
    left = stream.withWatermark(ts_col, watermark_delay).select(
        *[F.col(k).alias(f"a_{k}") for k in key_cols],
        F.col(id_col).alias(f"a_{id_col}"),
        F.col(ts_col).alias("a_ts"),
    )
    right = stream.withWatermark(ts_col, watermark_delay).select(
        *[F.col(k).alias(f"b_{k}") for k in key_cols],
        F.col(id_col).alias(f"b_{id_col}"),
        F.col(ts_col).alias("b_ts"),
    )
    cond = (
        (F.col("b_ts") >= F.col("a_ts") - F.expr(f"INTERVAL {band_seconds} SECONDS"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr(f"INTERVAL {band_seconds} SECONDS"))
        & (F.col(f"a_{id_col}") != F.col(f"b_{id_col}"))
    )
    for k in key_cols:
        cond = cond & (F.col(f"a_{k}") == F.col(f"b_{k}"))
    return left.join(right, cond)
