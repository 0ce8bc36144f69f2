from erigon_extract_spark.streaming.latest_state import (  # noqa: F401
    stream_latest_state,
    stream_windowed_counts,
)
