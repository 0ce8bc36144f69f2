"""Local mirror of the driver's t2 correctness gate: run every queries()
entry on Spark AND its oracle_sql() on DuckDB over the same parquet dir;
compare row count, column names, and order-insensitive value multiset.

This is the highest-leverage test in the repo: if it's green here at
sf0.001/sf0.01, the driver's CORRECTNESS_r{N}.json should be green too.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

# pytest runs a representative subset (suite runtime); the FULL matrix runs
# via `python tools/run_gate.py [sf_dir]`, which this file mirrors exactly.
SUBSET = [
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "j1_lookup_join",
    "j3_index_range_join",
    "w4_rekey_first_block",
    "asof_state_at",
    "asof_join",
    "dedup_exact",
    "text_stats",
    "sim_bruteforce_topk",
]
ROWS_ONLY_SUBSET = ["scalar_keccak256", "u256_arithmetic"]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0/0.0 and representation noise at hash-safe precision
        return round(v, 9)
    if isinstance(v, (bytes, bytearray, memoryview)):
        return bytes(v)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _spark_rows(df):
    cols = df.columns
    return cols, sorted(
        (tuple(_norm(r[c]) for c in cols) for r in df.collect()),
        key=repr,
    )


def _duck_rows(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, sorted(
        (tuple(_norm(v) for v in row) for row in cur.fetchall()), key=repr
    )


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, name):
    scols, srows = _spark_rows(QUERIES[name](spark, SF_DIR))
    con = _duck(SF_DIR)
    dcols, drows = _duck_rows(con, ORACLES[name])
    assert scols == dcols, f"{name}: columns {scols} != {dcols}"
    assert len(srows) == len(drows), (
        f"{name}: rowcount {len(srows)} != {len(drows)}"
    )
    mismatches = [
        (s, d) for s, d in zip(srows, drows) if s != d
    ]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY_SUBSET)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_driver_window_integrity():
    """The driver checks the FIRST 50 registered queries; the rotation
    list must compose that window exactly, every member must carry an
    oracle (a rows-only row wastes a scarce verification slot), and new
    registrations must never displace it."""
    win = list(QUERIES)[:50]
    from erigon_extract_spark.queries import _GATE_PRIORITY, ORACLES

    assert win == _GATE_PRIORITY
    assert len(_GATE_PRIORITY) == 50
    missing = [n for n in win if n not in ORACLES]
    assert not missing, f"window members without oracles: {missing}"
