"""Structured Streaming extension of the state pipeline (SURVEY.md §2.12).

The reference is one-shot batch over a frozen MDBX snapshot; its README
discusses in-place updates as future work (reference README.md:52-56).
Spark-natively, the continuing-sync story is: changesets arrive as an
append stream → watermark bounds lateness → dedup forks within the
watermark → running latest-state maintained in update mode.

These builders operate on any event-shaped stream; tests drive them with
the file source over the driver's ``events`` table using an
``availableNow`` trigger (batch-equivalent semantics, same code path a
Kafka source would take in production).

Scale notes: state-store size for latest-state is O(#keys), partitioned by
key hash; at 100 TB history the state is still only the live key set.
``dropDuplicates`` within a watermark keeps the dedup state bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_latest_state(
    stream: DataFrame,
    key_cols: list[str],
    version_col: str,
    value_cols: list[str],
    watermark_col: str | None = None,
    watermark_delay: str = "10 minutes",
    dedup_cols: list[str] | None = None,
) -> DataFrame:
    """Running latest version per key over an append stream (update mode).

    max_by keeps one row of state per key — the streaming analogue of the
    batch ``state_at`` operator.
    """
    if watermark_col is not None:
        stream = stream.withWatermark(watermark_col, watermark_delay)
    if dedup_cols:
        stream = stream.dropDuplicates(dedup_cols)
    aggs = [F.max(version_col).alias(version_col)] + [
        F.max_by(c, version_col).alias(c) for c in value_cols
    ]
    return stream.groupBy(*key_cols).agg(*aggs)


def stream_windowed_counts(
    stream: DataFrame,
    time_col: str,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
    group_cols: list[str] | None = None,
    slide_duration: str | None = None,
) -> DataFrame:
    """Watermarked windowed counts — the standard late-data-tolerant rollup
    for an event stream. Tumbling by default; pass ``slide_duration`` for
    hopping (sliding) windows, where each event lands in
    window/slide overlapping windows.

    ``withWatermark`` is a no-op on batch DataFrames, so the SAME builder
    runs in batch for the DuckDB oracle gate (queries
    ``window_tumbling_agg``/``window_hopping_agg``) and in streaming under
    an availableNow trigger — one code path, oracle-verified logic.
    """
    group_cols = group_cols or []
    w = stream.withWatermark(time_col, watermark_delay)
    window = (
        F.window(F.col(time_col), window_duration, slide_duration)
        if slide_duration
        else F.window(F.col(time_col), window_duration)
    )
    return (
        w.groupBy(window, *group_cols)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *group_cols,
            "n_events",
        )
    )
