#!/usr/bin/env python
"""Run the full queries()/oracle_sql() gate in ONE Spark session and report
per-query PASS/FAIL — a fast local mirror of the driver's t2 check.

Usage: python tools/run_gate.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from erigon_extract_spark import queries as q  # noqa: E402


def norm(v):
    # Type-tag every cell: the driver hashes whole pandas COLUMNS, so a
    # bool-vs-int or int-vs-float disagreement between engines hash-fails
    # even though Python `==` equates the values (True == 1, 1 == 1.0).
    # The untagged r1-r3 mirror missed two such classes; tag so the next
    # one fails HERE first.
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        # repr equality = bit-pattern equality of the rounded value, which
        # is what the driver hashes. Python == would equate -0.0 with 0.0
        # (they hash differently) and hide sign-of-zero divergences.
        return ("float", repr(round(v, 9)))
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, (bytes, bytearray, memoryview)):
        return ("bytes", bytes(v))
    if isinstance(v, (list, dict)):
        # The driver's canonicalizer (pandas sort_values -> factorize over
        # object cells) dies on list/dict cells; tolerating them here is
        # exactly what hid the erigon_tx_bodies red row in r1/r2. Mirror the
        # driver: non-scalar cells are an error, not a comparable value.
        raise TypeError(f"non-scalar cell {type(v).__name__}: driver rejects")
    return (type(v).__name__, v)


def run_one(spark, sf_dir: str, name: str) -> tuple[str, bool, str]:
    t0 = time.perf_counter()
    try:
        df = q.QUERIES[name](spark, sf_dir)
        from pyspark.sql import types as T

        bad_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if bad_cols:
            return name, False, (
                f"non-scalar output columns {bad_cols} — the driver's "
                "canonicalizer cannot hash list cells; project to scalars"
            )
        scols = df.columns
        srows = sorted(
            (tuple(norm(r[c]) for c in scols) for r in df.collect()), key=repr
        )
    except Exception:
        return name, False, "SPARK ERROR\n" + traceback.format_exc(limit=5)
    dt = time.perf_counter() - t0
    if name not in q.ORACLES:
        return name, True, f"rows-only, {len(srows)} rows ({dt:.1f}s)"
    con = duckdb.connect()
    try:
        # absolute spill dir: at 10x data DuckDB spills, and its default
        # RELATIVE ".tmp" dir crashed mid-sweep ("Could not remove file
        # .tmp/duckdb_temp_storage-0.tmp") — pin it somewhere stable
        con.execute("PRAGMA temp_directory='/tmp/duckdb_gate_spill'")
        con.execute("PRAGMA memory_limit='24GB'")
        for t in (
            "region nation customer supplier part orders lineitem events "
            "documents embeddings"
        ).split():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        rel = con.sql(q.ORACLES[name])
        # Mirror the driver's type strictness (the r3 lesson): DuckDB
        # widens integer SUM to HUGEINT (int128), which the driver's
        # pandas canonicalizer hashes differently from Spark's int64 even
        # when values are numerically equal — rows_match green,
        # hash_match red. One shared predicate with the oracle auditor.
        from erigon_extract_spark.oracle_compat import hostile_oracle_cols

        hostile = hostile_oracle_cols(rel.columns, rel.types)
        if hostile:
            return name, False, (
                f"oracle columns {hostile} widen beyond int64 — the "
                "driver hashes int128/Decimal differently than Spark's "
                "BIGINT; CAST(... AS BIGINT/DOUBLE) in the oracle SQL"
            )
        dcols = list(rel.columns)
        drows = sorted(
            (tuple(norm(v) for v in row) for row in rel.fetchall()), key=repr
        )
    except Exception:
        return name, False, "DUCKDB ERROR\n" + traceback.format_exc(limit=5)
    finally:
        con.close()
    if scols != dcols:
        return name, False, f"cols {scols} != {dcols}"
    if len(srows) != len(drows):
        only_s = [r for r in srows if r not in set(drows)][:2]
        only_d = [r for r in drows if r not in set(srows)][:2]
        return name, False, (
            f"rowcount {len(srows)} != {len(drows)}\n"
            f"  spark-only: {only_s}\n  duck-only:  {only_d}"
        )
    bad = [(s, d) for s, d in zip(srows, drows) if s != d]
    if bad:
        return name, False, f"{len(bad)} mismatched rows; first: {bad[:2]}"
    return name, True, f"{len(srows)} rows ({dt:.1f}s)"


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    names = args[1:] if len(args) > 1 else sorted(q.QUERIES)

    from concurrent.futures import ThreadPoolExecutor

    from erigon_extract_spark.session import get_spark

    # SPARK_GRAFT_TZ overrides the session timezone — run the mirror under
    # e.g. Pacific/Auckland to flush out any query whose parity silently
    # depends on the driver session being UTC (the r1/r2 sessionize class).
    import os

    tz = os.environ.get("SPARK_GRAFT_TZ")
    extra = {"spark.sql.session.timeZone": tz} if tz else {}
    # SPARK_GRAFT_EXTRA_CONF="k=v,k2=v2" sweeps any session config — e.g.
    # spark.sql.ansi.enabled=false — to flush queries whose parity depends
    # on a driver-session default (the timezone-class divergence, §NOTES)
    for kv in filter(None, os.environ.get(
            "SPARK_GRAFT_EXTRA_CONF", "").split(",")):
        k, _, v = kv.partition("=")
        extra[k.strip()] = v.strip()
    spark = get_spark(app_name="gate", extra_conf=extra or None)
    n_pass = n_fail = 0
    with ThreadPoolExecutor(max_workers=6) as pool:
        futs = {pool.submit(run_one, spark, sf_dir, n): n for n in names}
        for fut in futs:
            name, ok, msg = fut.result()
            if ok:
                n_pass += 1
                print(f"PASS {name}: {msg}", flush=True)
            else:
                n_fail += 1
                print(f"FAIL {name}: {msg}", flush=True)
    print(f"== {n_pass} pass, {n_fail} fail ==", flush=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
