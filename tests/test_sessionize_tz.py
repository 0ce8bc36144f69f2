"""Sessionize must be invariant to driver session configuration.

Round-1/2 history: `sessionize_events` hash-matched the local DuckDB mirror
(UTC session, session.py) but mismatched under the driver two rounds in a
row. The one session-sensitive op in the old path was `cast(ntz as
timestamp)`, whose epoch shifts with `spark.sql.session.timeZone` — and
non-uniformly across DST transitions, which changes gap comparisons. The
rewrite (operators/windows.session_tick_micros) derives integer-µs ticks
straight from the stored ntz value, so these tests pin: same results under
UTC, a fixed-offset zone, and a DST-observing zone.
"""

from __future__ import annotations

import pytest

from erigon_extract_spark import queries as q

TZS = ["UTC", "America/New_York", "Pacific/Auckland", "Asia/Kathmandu"]


def _collect_under_tz(spark, sf_dir, name, tz):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try:
        df = q.QUERIES[name](spark, sf_dir)
        return sorted(tuple(r) for r in df.collect())
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


@pytest.mark.parametrize(
    "name",
    [
        "sessionize_events",
        "sessionize_debug",
        # streaming-window gate queries read the ntz column directly
        # (Spark 3.4+ time windows accept timestamp_ntz), so their window
        # boundaries are wall-clock arithmetic — same invariance class
        "window_tumbling_agg",
        "window_hopping_agg",
        "session_window_agg",
        "range_interval_join",
    ],
)
def test_sessionize_is_session_tz_invariant(spark, sf_dir, name):
    if name == "range_interval_join":
        # the +-5s band finds no pairs in the sparse sf0.001 events —
        # use the next SF up so the invariance check covers real rows
        sf_dir = sf_dir.replace("sf0.001", "sf0.01")
    base = _collect_under_tz(spark, sf_dir, name, "UTC")
    assert len(base) > 0
    for tz in TZS[1:]:
        other = _collect_under_tz(spark, sf_dir, name, tz)
        assert other == base, f"{name} differs under session TZ {tz}"


def test_tick_micros_equals_stored_ntz_value(spark, sf_dir):
    """The debug tick must equal the parquet-stored µs value exactly —
    verified against DuckDB's epoch_us over the same file (naive reads on
    both engines, no session involvement anywhere)."""
    import duckdb

    rows = _collect_under_tz(spark, sf_dir, "sessionize_debug", "Pacific/Auckland")
    got = {(r[0], r[1]): r[2] for r in rows}
    con = duckdb.connect()
    try:
        want = dict(
            con.execute(
                "SELECT (user_id, event_id), epoch_us(CAST(ts AS TIMESTAMP)) "
                f"FROM '{sf_dir}/events.parquet'"
            ).fetchall()
        )
    finally:
        con.close()
    want = {tuple(k): v for k, v in want.items()}
    assert got == want
