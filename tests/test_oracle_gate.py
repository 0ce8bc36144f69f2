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
    """The driver checks the FIRST 50 registered queries. Since r6 the
    window is MECHANICAL (VERDICT r5 #2): replay the rotation rule on
    the committed CORRECTNESS_r*.json ledger and assert the live window
    equals its output — a hand edit of the priority, a ledger rewrite,
    or a rule change that shifts the composition all fail here."""
    from erigon_extract_spark import rotation
    from erigon_extract_spark.queries import (
        _GATE_PRIORITY,
        _REGISTRATION_ORDER,
        ORACLES,
    )

    win = list(QUERIES)[:50]
    assert win == _GATE_PRIORITY
    assert len(_GATE_PRIORITY) == 50

    ledger = rotation.load_ledger()
    assert ledger, "committed CORRECTNESS_r*.json artifacts not found"
    derived = rotation.compute_gate_priority(
        ledger, _REGISTRATION_ORDER, set(ORACLES)
    )
    assert win == derived, (
        "window does not derive from the ledger: "
        f"first divergence at {next(i for i, (a, b) in enumerate(zip(win, derived)) if a != b)}"
    )

    # a rows-only member may hold a slot ONLY until its first recorded
    # row count (its evidence ceiling) — until that count goes STALE
    # (>= REFRESH_AFTER rounds old), at which point tier 5b re-samples
    # it so a cardinality-changing regression can't hide behind
    # permanent retirement (r7 advice). An errored appearance without a
    # count is not evidence and may re-seat at any time.
    latest = max(ledger)
    last_count = {}
    for rnd, rows in ledger.items():
        for n, row in rows.items():
            if row.get("spark_rows") is not None:
                last_count[n] = max(last_count.get(n, 0), rnd)
    fresh_rows_only = [
        n
        for n in win
        if n not in ORACLES
        and n in last_count
        and latest - last_count[n] < rotation.REFRESH_AFTER
    ]
    assert not fresh_rows_only, fresh_rows_only


def test_rotation_rule_readmits_reds_first():
    """The r1-r5 failure mode, pinned as a unit case: a query red at its
    last appearance outranks never-gated AND once-green queries, however
    old its red row is."""
    from erigon_extract_spark.rotation import compute_gate_priority

    reg = ["a_never", "b_red", "c_once", "d_durable", "e_rows_only"]
    oracles = {"a_never", "b_red", "c_once", "d_durable"}
    ledger = {
        1: {
            "b_red": {"rows_match": None, "hash_match": None,
                      "spark_rows": 3, "err": "no_oracle"},
            "c_once": {"rows_match": True, "hash_match": True},
            "d_durable": {"rows_match": True, "hash_match": True},
        },
        2: {"d_durable": {"rows_match": True, "hash_match": True}},
    }
    got = compute_gate_priority(ledger, reg, oracles, window=5)
    assert got == ["b_red", "a_never", "e_rows_only", "c_once", "d_durable"]
    # empty ledger (round 1): pure registration order, nothing crashes
    assert compute_gate_priority({}, reg, oracles, window=3) == reg[:3]


def test_rotation_retires_seen_rows_only():
    """The r6 failure mode, pinned: a rows-only query WITH a driver row
    must sink below every hash-verifiable tier — the driver can only
    re-record the same row count, so re-seating it wastes a slot."""
    from erigon_extract_spark.rotation import compute_gate_priority

    reg = ["a_rows_seen", "b_once", "c_durable", "d_rows_never"]
    oracles = {"b_once", "c_durable"}
    ledger = {
        1: {
            "a_rows_seen": {"rows_match": None, "hash_match": None,
                            "spark_rows": 7, "err": "no_oracle"},
            "b_once": {"rows_match": True, "hash_match": True},
            "c_durable": {"rows_match": True, "hash_match": True},
        },
        2: {"c_durable": {"rows_match": True, "hash_match": True}},
    }
    got = compute_gate_priority(ledger, reg, oracles, window=4)
    assert got == ["d_rows_never", "b_once", "c_durable", "a_rows_seen"]
    # a red-looking rows-only row ALSO retires as long as a row count was
    # captured — err is unreadable as a hash defect when no hash exists
    ledger[1]["a_rows_seen"]["err"] = "timeout"
    got = compute_gate_priority(ledger, reg, oracles, window=4)
    assert got == ["d_rows_never", "b_once", "c_durable", "a_rows_seen"]
    # but an appearance WITHOUT a row count is not evidence: the query
    # must stay seated (tier 3) until the driver captures its count
    ledger[1]["a_rows_seen"]["spark_rows"] = None
    got = compute_gate_priority(ledger, reg, oracles, window=4)
    assert got == ["a_rows_seen", "d_rows_never", "b_once", "c_durable"]
