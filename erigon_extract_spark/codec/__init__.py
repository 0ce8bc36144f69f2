from erigon_extract_spark.codec.opstream import (  # noqa: F401
    encode_state_history,
    decode_state_history,
    encode_partition,
    decode_blob,
)
