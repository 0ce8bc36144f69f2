#!/usr/bin/env python
"""Task-retry purity probe: operators must be idempotent under Spark's
task re-execution.

At 1000 executors, task retries are not an edge case — they are steady
state (preemption, spot loss, stragglers re-launched by speculation).
Spark's recovery model assumes every task is a pure function of its
input split: a retried task recomputes and its output REPLACES the
failed attempt's. An operator that breaks that assumption (mutable
closure state, attempt-dependent output, batch-boundary-sensitive
results that change when a retry re-batches) produces silently wrong
results only on clusters — never on a retry-free local[32] run, which
is exactly why no prior ledger could catch it.

This probe injects a one-shot failure into the FIRST attempt of one
task (via a pass-through ``mapInPandas`` tap that consults
``TaskContext.attemptNumber()``) underneath representative Arrow-kernel
and shuffle operators, on a ``local[8,2]`` master (the second slot is
``maxFailures`` — plain ``local[N]`` fails fast and never retries).
Each operator's output with the injected retry must equal the
undisturbed run exactly.

Covered kernels: the CDC chunker (stateless Arrow map), the clamped
walk, k-means (driver-reduced partials — retry re-emits a partition's
partial sums), MinHash-LSH candidate pairs (shuffle above the tap),
and exact dedup (hash agg above the tap).

Usage: python tools/fault_probe.py [sf_dir]
Prints one PASS/FAIL line per operator and exits nonzero on any FAIL.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def flaky_tap(df, schema, acc):
    """Pass-through mapInPandas that fails the first attempt of the
    first task — forcing exactly one task retry per action. ``acc``
    counts RETRIED attempts (attemptNumber > 0) so the caller can PROVE
    a retry actually executed: counting the raise itself would be
    vacuous, because Spark discards accumulator updates from FAILED
    tasks — only the successful retry's update survives."""

    def tap(batches):
        from pyspark import TaskContext

        tc = TaskContext.get()
        if tc is not None and tc.partitionId() == 0:
            if tc.attemptNumber() == 0:
                raise RuntimeError("injected first-attempt failure")
            acc.add(1)
        yield from batches

    return df.mapInPandas(tap, schema=schema)


def rows(df):
    return sorted(map(tuple, df.collect()))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from erigon_extract_spark.session import get_spark

    # local[8,2]: 8 threads, maxFailures=2 — one retry budget, which is
    # exactly what the injected one-shot failure consumes
    spark = get_spark(app_name="fault_probe", master="local[8,2]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    from erigon_extract_spark.operators.clustering import kmeans_lloyd
    from erigon_extract_spark.operators.dedup import (
        cdc_chunks,
        exact_dedup,
        minhash_lsh_pairs_portable,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    doc_schema = "doc_id long, text string"
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in emb.schema.fields
    )

    n_fail = 0
    acc = spark.sparkContext.accumulator(0)

    def check(name, clean_df, flaky_df):
        nonlocal n_fail
        want = rows(clean_df)
        before = acc.value
        got = rows(flaky_df)
        injected = acc.value - before
        ok = want == got and len(want) > 0 and injected >= 1
        print(f"{'PASS' if ok else 'FAIL'} {name}: "
              f"{len(got)} rows (clean {len(want)}), "
              f"{injected} retried tasks", flush=True)
        n_fail += not ok

    check(
        "cdc_chunks",
        cdc_chunks(docs),
        cdc_chunks(flaky_tap(docs, doc_schema, acc)),
    )
    check(
        "cdc_chunks_clamped",
        cdc_chunks(docs, min_size=32, max_size=128),
        cdc_chunks(flaky_tap(docs, doc_schema, acc), min_size=32, max_size=128),
    )
    check(
        "exact_dedup",
        exact_dedup(docs),
        exact_dedup(flaky_tap(docs, doc_schema, acc)),
    )
    check(
        "minhash_lsh_portable",
        minhash_lsh_pairs_portable(docs),
        minhash_lsh_pairs_portable(flaky_tap(docs, doc_schema, acc)),
    )

    a_clean, c_clean = kmeans_lloyd(emb, k=4, iters=2)
    before = acc.value
    a_flaky, c_flaky = kmeans_lloyd(flaky_tap(emb, emb_schema, acc),
                                    k=4, iters=2)
    injected = acc.value - before
    ok = c_clean == c_flaky and injected >= 1
    print(f"{'PASS' if ok else 'FAIL'} kmeans_centroids: "
          f"{len(c_flaky)} centroids equal={c_clean == c_flaky}, "
          f"{injected} retried tasks", flush=True)
    n_fail += not ok
    check("kmeans_assignments", a_clean, a_flaky)

    print(f"== {'ALL PASS' if not n_fail else f'{n_fail} FAIL'} ==",
          flush=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
