"""CSV document source — the other interchange format corpora arrive in.

Rules this module encodes (each one a 100 TB lesson, mirroring
sources/jsonl.py):

- **Explicit schema, never inferSchema.** CSV inference is an extra full
  pass AND type-unstable (a column that looks integer for 10 TB becomes
  string at byte 10 TB + 1). The schema is the ``documents`` contract.
- **RFC 4180 quoting, not backslash escapes.** Spark's CSV default escape
  is ``\\`` — almost no real CSV producer writes that; the standard (and
  DuckDB, Postgres, Excel) doubles the quote char. ``escape='"'`` makes
  Spark parse the doubled-quote convention, so the same bytes mean the
  same values in every engine that touches the corpus.
- **No multiLine.** ``multiLine=true`` makes files unsplittable (one
  executor per file, however large). Records with embedded newlines must
  be quarantined upstream or re-encoded; a splittable line-per-record
  layout is what lets a single 1 TB file fan out across a cluster.
- **PERMISSIVE + quarantine column.** A malformed line becomes a row with
  ``_corrupt`` holding the raw text — route to a dead-letter sink, never
  kill the ingest (FAILFAST is for CI).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_CSV_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("_corrupt", T.StringType()),
    ]
)


def read_documents_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read a documents CSV against the explicit contract schema with
    RFC 4180 quoting. Malformed lines surface as ``_corrupt`` rows."""
    return (
        spark.read.schema(DOCUMENTS_CSV_SCHEMA)
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')  # RFC 4180 doubled-quote convention
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )


def read_documents_csv_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin of :func:`read_documents_csv` — same explicit
    schema, RFC 4180 quoting, and PERMISSIVE quarantine over a directory
    watched by Structured Streaming (the file-drop ingest pattern: a
    crawler lands CSV shards, the stream picks each up exactly once via
    the source's file tracking). Batch/stream parity is pinned by an
    availableNow == batch pytest."""
    return (
        spark.readStream.schema(DOCUMENTS_CSV_SCHEMA)
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the quarantine column, corrupt rows) — same
    contract and SPARK-21610 caveat as sources/jsonl.split_quarantine."""
    clean = df.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    bad = df.filter(F.col("_corrupt").isNotNull())
    return clean, bad


# ---------------------------------------------------------------------------
# Committed sample fixture for the oracle gate: a pure function of its
# literal content, so Spark and DuckDB read the identical bytes. The text
# field deliberately exercises the quoting corners: embedded commas,
# doubled quotes, and leading/trailing spaces inside quotes.
# ---------------------------------------------------------------------------

SAMPLE_PATH = (
    Path(__file__).resolve().parent.parent.parent
    / "fixtures_csv"
    / "documents_sample.csv"
)


def _csv_field(s: str) -> str:
    return '"' + s.replace('"', '""') + '"'


def ensure_sample(path: Path = SAMPLE_PATH) -> Path:
    """Write the deterministic CSV sample if missing (50 valid rows, pure
    function of the literals below; every text field is quoted and
    contains a comma, and every 5th contains a doubled quote)."""
    if path.exists():
        return path
    langs = ["en", "de", "fr", "es"]
    lines = ["doc_id,text,lang,source,n_chars"]
    for i in range(50):
        text = f"row {i}, with a comma"
        if i % 5 == 0:
            text += f' and a "quoted" span {i}'
        lines.append(
            f"{i},{_csv_field(text)},{langs[i % 4]},src{i % 3},{len(text)}"
        )
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("\n".join(lines) + "\n")
    return path
