from erigon_extract_spark.sources.tables import (  # noqa: F401
    read_table,
    write_sorted_parquet,
    write_manifest,
    read_manifest,
)
