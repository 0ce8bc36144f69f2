"""JSONL (newline-delimited JSON) document source — the interchange format
LLM corpora actually arrive in at scale.

Rules this module encodes (each one is a 100 TB lesson):

- **Explicit schema, never inferSchema.** Inference is a full extra pass
  over the data before the real read, and a schema that drifts with the
  sample. The schema here is the engine's ``documents`` contract.
- **PERMISSIVE mode with a quarantine column.** A malformed line becomes a
  row whose ``_corrupt`` column holds the raw text and whose typed columns
  are null — the job keeps running, and the quarantine rows are routed to
  a dead-letter sink instead of killing a week-long ingest (FAILFAST is
  for CI, not production).
- **JSONL splits by line**, so a single large file still fans out across
  executors — same splittable-ingest property the page-restartable codec
  was designed for (codec/refstream.py).
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("_corrupt", T.StringType()),
    ]
)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read a documents JSONL file against the explicit contract schema.
    Malformed lines surface as rows with ``_corrupt`` set (typed columns
    null) rather than failures."""
    return (
        spark.read.schema(DOCUMENTS_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_the_quarantine_column, corrupt_rows).

    The quarantine side keeps the FULL row, not just ``_corrupt``: Spark
    disallows queries whose referenced columns are only the internal
    corrupt-record column (SPARK-21610) — and the dead-letter sink wants
    whatever typed fields did parse anyway. Note: ``bad.count()`` still
    trips the restriction (column pruning reduces it to the corrupt
    column alone) — write the quarantine out or collect it instead."""
    clean = df.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    bad = df.filter(F.col("_corrupt").isNotNull())
    return clean, bad


def write_documents_jsonl(df: DataFrame, path: str) -> None:
    """Write the documents contract back out as JSONL (one dir of part
    files — the splittable layout a downstream distributed reader wants)."""
    df.write.mode("overwrite").json(path)


# ---------------------------------------------------------------------------
# Committed sample fixture for the oracle gate: a pure function of its
# literal content, so Spark and DuckDB read the identical bytes.
# ---------------------------------------------------------------------------

SAMPLE_PATH = (
    Path(__file__).resolve().parent.parent.parent
    / "fixtures_jsonl"
    / "documents_sample.jsonl"
)


def ensure_sample(path: Path = SAMPLE_PATH) -> Path:
    """Write the deterministic JSONL sample if missing (50 valid lines,
    pure function of the literals below)."""
    if path.exists():
        return path
    rows = []
    langs = ["en", "de", "fr", "es"]
    for i in range(50):
        text = f"sample document {i} " + ("lorem ipsum " * (i % 7 + 1)).strip()
        rows.append(
            {
                "doc_id": i,
                "text": text,
                "lang": langs[i % 4],
                "source": f"src{i % 3}",
                "n_chars": len(text),
            }
        )
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r, sort_keys=True) + "\n")
    return path
