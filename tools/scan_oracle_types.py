#!/usr/bin/env python
"""Scan every registered oracle's DuckDB result schema for driver-hostile
column types.

The r3 driver lesson (VERDICT.md §What's wrong #1): DuckDB widens integer
SUM() to HUGEINT (int128). The driver canonicalizes results through pandas,
where an int128 column lands as object/int128 and hashes differently from
Spark's int64 — rows_match stays green while hash_match fails. Any oracle
whose result schema contains HUGEINT / UHUGEINT / DECIMAL wider than int64
is a latent red row even when the values are numerically identical.

Usage: python tools/scan_oracle_types.py [sf_dir]
Prints one line per offending (query, column, type); exit 1 if any found.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from erigon_extract_spark import queries as q  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

from erigon_extract_spark.oracle_compat import hostile_oracle_cols  # noqa: E402


def bad_cols(con, sql: str) -> list[tuple[str, str]]:
    rel = con.sql(sql)
    return hostile_oracle_cols(rel.columns, rel.types)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_bad = 0
    for name, sql in sorted(q.ORACLES.items()):
        try:
            offenders = bad_cols(con, sql)
        except Exception as exc:  # noqa: BLE001
            print(f"ERR  {name}: {type(exc).__name__}: {exc}")
            n_bad += 1
            continue
        for col, typ in offenders:
            print(f"BAD  {name}: column {col!r} is {typ}")
            n_bad += 1
    if n_bad:
        print(f"== {n_bad} driver-hostile oracle columns ==")
        sys.exit(1)
    print(f"== all {len(q.ORACLES)} oracles int64-clean ==")


if __name__ == "__main__":
    main()
