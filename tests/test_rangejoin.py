"""Band (interval) self-join: correctness vs a naive theta-join, and a plan
assertion that the bucketed rewrite stays an equi-join — the property that
makes it linear at 100 TB where a theta-join plans a cartesian product."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from erigon_extract_spark.operators.rangejoin import band_self_join


def _mk_events(spark):
    base = datetime(2024, 1, 1)
    rows = [
        # (event_id, event_type, seconds offset)
        (1, "click", 0),
        (2, "click", 3),       # within 5s of 1
        (3, "click", 5),       # exactly on the band edge of 1 (inclusive)
        (4, "click", 20),      # isolated
        (5, "view", 4),        # other key: never pairs with clicks
        (6, "view", 100),
        (7, "view", 104),      # within 5s of 6, crosses a bucket boundary
    ]
    return spark.createDataFrame(
        [(i, t, base + timedelta(seconds=s)) for i, t, s in rows],
        "event_id long, event_type string, ts timestamp",
    )


def test_band_self_join_matches_naive_theta(spark):
    df = _mk_events(spark)
    got = band_self_join(df, ["event_type"], "ts", 5_000_000, "event_id")
    got_pairs = {
        (r.a_event_id, r.b_event_id)
        for r in got.select("a_event_id", "b_event_id").collect()
    }

    a, b = df.alias("a"), df.alias("b")
    naive = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (
            F.abs(F.unix_micros("a.ts") - F.unix_micros("b.ts"))
            <= F.lit(5_000_000)
        )
        & (F.col("a.event_id") != F.col("b.event_id")),
    )
    want_pairs = {
        (r[0], r[1])
        for r in naive.select("a.event_id", "b.event_id").collect()
    }
    assert got_pairs == want_pairs
    # band edge is inclusive (BETWEEN semantics) and symmetric
    assert (1, 3) in got_pairs and (3, 1) in got_pairs
    # cross-bucket neighbors still pair (the explode probes adjacent buckets)
    assert (6, 7) in got_pairs
    # no duplicate candidate pairs from the 3-bucket probe
    assert got.count() == len(got_pairs)


def test_band_self_join_plans_equi_join(spark):
    df = _mk_events(spark)
    plan = (
        band_self_join(df, ["event_type"], "ts", 5_000_000, "event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_band_self_join_random_matches_naive(spark):
    """Seeded-random stress: dense, duplicate, and boundary timestamps
    across several keys must produce exactly the naive theta-join's pairs."""
    import random

    rng = random.Random(1234)
    base = datetime(2024, 6, 1)
    rows = [
        (
            i,
            rng.choice(["a", "b", "c"]),
            base + timedelta(microseconds=rng.randrange(0, 60_000_000)),
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp"
    )
    band = 3_000_000
    got = {
        (r.a_event_id, r.b_event_id)
        for r in band_self_join(
            df, ["event_type"], "ts", band, "event_id"
        ).collect()
    }
    by_key: dict[str, list[tuple[int, int]]] = {}
    for i, k, ts in rows:
        by_key.setdefault(k, []).append((i, int(ts.timestamp() * 1_000_000)))
    want = {
        (i, j)
        for pairs in by_key.values()
        for i, ti in pairs
        for j, tj in pairs
        if i != j and abs(ti - tj) <= band
    }
    assert got == want and len(want) > 1000
