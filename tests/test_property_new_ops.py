"""Seeded-random differential tests for the round-3 operators: an
independent pure-python re-implementation must agree exactly (the
rangejoin test pattern — randomized inputs, deterministic seeds)."""

from __future__ import annotations

import hashlib
import random


def _norm(t: str) -> str:
    return " ".join(t.lower().split())


def _python_spans(texts: dict[int, str], width: int):
    """Independent brute-force of the duplicate_spans definition at
    stride=1: gram -> docs map, cross-doc hits, gaps-and-islands merge."""
    grams: dict[str, set[int]] = {}
    positions: dict[int, list[int]] = {d: [] for d in texts}
    norm = {d: _norm(t) for d, t in texts.items()}
    for d, t in norm.items():
        if len(t) < width:
            continue
        for p in range(len(t) - width + 1):
            grams.setdefault(t[p:p + width], set()).add(d)
    for d, t in norm.items():
        for p in range(max(0, len(t) - width + 1)):
            if len(t) >= width and len(grams[t[p:p + width]]) >= 2:
                positions[d].append(p + 1)  # 1-based
    out = set()
    for d, ps in positions.items():
        if not ps:
            continue
        start = prev = ps[0]
        for p in ps[1:]:
            if p - prev <= width:
                prev = p
            else:
                out.add((d, start, prev + width - 1, prev + width - start))
                start = prev = p
        out.add((d, start, prev + width - 1, prev + width - start))
    return out


def test_duplicate_spans_matches_python_reference_random(spark):
    from erigon_extract_spark.operators.dedup import duplicate_spans

    width = 12
    for seed in (1, 7, 42):
        rng = random.Random(seed)
        vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
        texts = {}
        for d in range(12):
            n = rng.randint(0, 30)
            texts[d] = " ".join(rng.choice(vocab) for _ in range(n))
        docs = spark.createDataFrame(
            list(texts.items()), "doc_id long, text string"
        )
        got = {
            (r.doc_id, r.span_start, r.span_end, r.span_len)
            for r in duplicate_spans(docs, width=width, stride=1).collect()
        }
        assert got == _python_spans(texts, width), seed


def _python_cms_bucket(i: int, k: str, width: int) -> int:
    return int(hashlib.md5(f"{i}_{k}".encode()).hexdigest()[:8], 16) % width


def test_cms_estimates_match_python_reference_random(spark):
    from erigon_extract_spark.operators.sketch import cms_heavy_hitters

    depth, width = 3, 16
    for seed in (3, 11):
        rng = random.Random(seed)
        keys = [rng.randint(0, 40) for _ in range(600)]
        df = spark.createDataFrame([(k,) for k in keys], "user_id long")
        got = {r.user_id: (r.est_count, r.true_count) for r in
               cms_heavy_hitters(df, "user_id", depth=depth, width=width,
                                 top_k=100).collect()}
        # python reference sketch
        cells: dict[tuple[int, int], int] = {}
        from collections import Counter

        true = Counter(keys)
        for k, c in true.items():
            for i in range(depth):
                b = _python_cms_bucket(i, str(k), width)
                cells[(i, b)] = cells.get((i, b), 0) + c
        for k, (est, tc) in got.items():
            ref = min(cells[(i, _python_cms_bucket(i, str(k), width))]
                      for i in range(depth))
            assert (est, tc) == (ref, true[k]), (seed, k)
        assert set(got) == set(true)


def test_bloom_no_false_negatives_random(spark):
    """Property over random key sets: every inserted key reports
    maybe=True, for several (m, k) shapes and seeds."""
    from pyspark.sql import functions as F

    from erigon_extract_spark.operators.sketch import (
        bloom_build,
        bloom_maybe_contains,
    )

    for seed, m_bits, k in ((3, 1 << 10, 3), (9, 1 << 14, 6)):
        rng = random.Random(seed)
        keys = list({rng.randint(0, 10**9) for _ in range(400)})
        df = spark.createDataFrame([(x,) for x in keys], "key long")
        out = bloom_maybe_contains(
            bloom_build(df, "key", m_bits=m_bits, k=k),
            df, "key", m_bits=m_bits, k=k,
        ).collect()
        assert len(out) == len(keys)
        assert all(r.maybe for r in out)


def test_hll_merge_equals_union_random(spark):
    """Sketch(A) merge Sketch(B) == Sketch(A ∪ B) register-for-register,
    for random disjoint and overlapping splits."""
    from pyspark.sql import functions as F

    from erigon_extract_spark.operators.sketch import hll_build, hll_merge

    rng = random.Random(5)
    a_keys = [rng.randint(0, 10**6) for _ in range(500)]
    b_keys = [rng.randint(0, 10**6) for _ in range(500)] + a_keys[:100]
    a = spark.createDataFrame([(x,) for x in a_keys], "k long")
    b = spark.createDataFrame([(x,) for x in b_keys], "k long")
    both = a.union(b)
    merged = {
        (r.bucket, r.r)
        for r in hll_merge(
            hll_build(a, "k", m=128), hll_build(b, "k", m=128)
        ).collect()
    }
    direct = {
        (r.bucket, r.r) for r in hll_build(both, "k", m=128).collect()
    }
    assert merged == direct


def test_intervalize_partitions_version_line_random(spark):
    """Property: per key, intervals are disjoint, cover exactly the
    version range, chain correctly (valid_to == next valid_from), and
    exactly one is_current."""
    from erigon_extract_spark.operators.windows import intervalize

    rng = random.Random(13)
    rows = []
    for k in range(10):
        for v in rng.sample(range(1000), rng.randint(1, 12)):
            rows.append((k, v, f"s{v}"))
    df = spark.createDataFrame(rows, "k long, v long, s string")
    by_key = {}
    for r in intervalize(df, ["k"], "v", ["s"]).collect():
        by_key.setdefault(r.k, []).append(r)
    for k, ivs in by_key.items():
        ivs.sort(key=lambda r: r.valid_from)
        versions = sorted(v for kk, v, _ in rows if kk == k)
        assert [r.valid_from for r in ivs] == versions
        assert sum(1 for r in ivs if r.is_current) == 1
        for prev, nxt in zip(ivs, ivs[1:]):
            assert prev.valid_to == nxt.valid_from
        assert ivs[-1].valid_to is None


def test_length_bucket_batches_total_and_bounds_random(spark):
    """Every doc lands in exactly one batch; capacity and band bounds
    hold on random corpora."""
    from erigon_extract_spark.operators.packing import length_bucket_batches

    rng = random.Random(21)
    docs = spark.createDataFrame(
        [(i, "w " * rng.randint(1, 600)) for i in range(300)],
        "doc_id long, text string",
    )
    out = length_bucket_batches(docs, batch_tokens=512, n_shards=4).collect()
    assert len(out) == 300
    assert len({r.doc_id for r in out}) == 300
    for r in out:
        assert (1 << r.band) <= r.n_tokens < (1 << (r.band + 1))
        assert r.batch_size <= max(1, 512 >> (r.band + 1))


def test_interpolate_at_matches_python_reference_random(spark):
    """Random irregular series + random grid vs a plain-python bisect
    recompute of the same semantics (MAX-collapse, bracket, hold,
    NULL-if-empty) — pins the windowed formulation to the definition."""
    import bisect

    from pyspark.sql import functions as F

    from erigon_extract_spark.operators.windows import interpolate_at

    rng = random.Random(606)
    base_us = 1_700_000_000_000_000
    samples, grid, ref = [], [], {}
    series = {}
    for key in range(8):
        n = rng.randint(0, 12)
        pts = {}
        for _ in range(n):
            t = base_us + rng.randint(0, 1000) * 1_000_000
            v = round(rng.uniform(-50, 50), 3)
            pts[t] = max(pts.get(t, -1e18), v)  # MAX-collapse duplicates
            samples.append((key, t, v))
        series[key] = sorted(pts.items())
    for key in range(8):
        for _ in range(25):
            g = base_us + rng.randint(0, 1000) * 1_000_000
            grid.append((key, g))
            pts = series[key]
            if not pts:
                ref[(key, g)] = None
                continue
            ts = [t for t, _ in pts]
            i = bisect.bisect_right(ts, g)
            if i == 0:
                ref[(key, g)] = round(pts[0][1], 6)
            elif i == len(pts):
                ref[(key, g)] = round(pts[-1][1], 6)
            else:
                (t0, v0), (t1, v1) = pts[i - 1], pts[i]
                frac = (g - t0) / (t1 - t0)
                ref[(key, g)] = round(v0 + (v1 - v0) * frac, 6)
    sdf = spark.createDataFrame(
        samples, "user_id long, t_us long, value double"
    ).select("user_id", F.timestamp_micros("t_us").alias("ts"), "value")
    gdf = (
        spark.createDataFrame(grid, "user_id long, t_us long")
        .distinct()
        .select("user_id", F.timestamp_micros("t_us").alias("tick"))
    )
    out = interpolate_at(sdf, gdf)
    from datetime import timezone

    got = {
        (
            r.user_id,
            # collected ticks are session-naive; the session runs UTC, so
            # pin the tz explicitly rather than trusting host localtime
            int(r.tick.replace(tzinfo=timezone.utc).timestamp() * 1_000_000),
        ): r.value_interp
        for r in out.collect()
    }
    # grid had duplicates dropped by distinct(); compare the dedup'd set
    want = {k: ref[k] for k in set(ref)}
    assert set(got) == set(want)
    for k in want:
        if want[k] is None:
            assert got[k] is None, k
        else:
            assert got[k] is not None and abs(got[k] - want[k]) < 1e-6, (
                k, got[k], want[k]
            )
