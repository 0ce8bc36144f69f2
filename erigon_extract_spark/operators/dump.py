"""Canonical text serialization of state rows — the K5 pretty-print sink
(reference show_file/print_account/print_storage, erigon_extract.c:361-424,
2002-2040), which doubles as the golden-file oracle: two pipelines agree
iff their canonical dumps are identical.

Format (one line per row, sorted):
  A <address_hex> @<block_from> nonce=<n> balance=<hex-trimmed> inc=<i> code=<hex|->
  S <address_hex> inc=<i> slot=<hex> @<block_from> value=<hex-trimmed>
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _trimmed_hex(col) -> F.Column:
    """Lowercase hex with leading zeros trimmed; '0' for all-zero values
    (the reference's print_number convention, erigon_extract.c:80-103)."""
    h = F.lower(F.hex(col))
    t = F.regexp_replace(h, "^0+", "")
    return F.when(col.isNull(), F.lit("-")).when(t == "", F.lit("0")).otherwise(t)


def canonical_dump(state_history: DataFrame) -> DataFrame:
    """One canonical text line per state row (column ``line``)."""
    addr = F.lower(F.hex("address"))
    acct = F.concat(
        F.lit("A "), addr,
        F.lit(" @"), F.col("block_from").cast("string"),
        F.lit(" nonce="), F.coalesce(F.col("nonce"), F.lit(0)).cast("string"),
        F.lit(" balance="), _trimmed_hex(F.col("balance")),
        F.lit(" inc="), F.col("incarnation").cast("string"),
        F.lit(" code="), _trimmed_hex(F.col("code_hash")),
    )
    stor = F.concat(
        F.lit("S "), addr,
        F.lit(" inc="), F.col("incarnation").cast("string"),
        F.lit(" slot="), F.lower(F.hex("slot")),
        F.lit(" @"), F.col("block_from").cast("string"),
        F.lit(" value="), _trimmed_hex(F.col("value")),
    )
    return state_history.select(
        F.when(F.col("kind") == 0, acct).otherwise(stor).alias("line")
    )


def dump_text(state_history: DataFrame) -> str:
    """Driver-side canonical dump string (sorted) for golden-file tests.
    Only for test-scale data — collects to the driver by design."""
    lines = [r["line"] for r in canonical_dump(state_history).collect()]
    return "\n".join(sorted(lines)) + "\n"
