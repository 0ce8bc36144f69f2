"""Count-min sketch: fixed-size frequency summaries for heavy-hitter
detection over unbounded key domains.

At 100 TB a `groupBy(key).count()` over a high-cardinality key shuffles the
whole key domain; a count-min sketch reduces the aggregate to a constant
``depth x width`` table (one shuffle with map-side combine into at most
depth*width cells), at the cost of overestimation from hash collisions —
the estimate is an upper bound, exact when no collision hit a key's
minimum-count cell (Cormode & Muthukrishnan 2005).

The hash family is md5-derived (row index salted into the input), so the
sketch — and therefore every estimate — is reproducible in ANSI SQL for
the oracle gate, across engines, runs, and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(i_col, key_str_col, width: int) -> F.Column:
    """Row-salted md5 bucket: hash_i(k) = md5(i || '_' || k) % width."""
    h = F.md5(F.concat(i_col.cast("string"), F.lit("_"), key_str_col))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width


def cms_build(
    df: DataFrame, key_col: str, *, depth: int = 4, width: int = 64
) -> DataFrame:
    """Aggregate a count-min sketch: one row per non-empty (row, bucket)
    cell. ONE shuffle, map-side combine collapses each partition to at most
    depth*width rows before the exchange — the shuffle payload is constant
    in input size, the property that makes the sketch worth it at scale."""
    rows = df.select(
        F.col(key_col).cast("string").alias("k"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("i"),
    )
    return (
        rows.select("i", _bucket(F.col("i"), F.col("k"), width).alias("b"))
        .groupBy("i", "b")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Estimate each candidate key's frequency: min over the sketch rows of
    the key's cell. The sketch (<= depth*width rows) broadcasts; the only
    shuffle is the per-key min-agg over depth probe rows."""
    probes = keys.select(
        F.col(key_col),
        F.col(key_col).cast("string").alias("k"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("i"),
    ).select(
        key_col, "i", _bucket(F.col("i"), F.col("k"), width).alias("b")
    )
    # LEFT join: a probe cell the sketch never populated counts as 0 — an
    # inner join would inflate (or for fully-unseen keys, drop) estimates
    # for keys absent from the sketched data, breaking the CMS guarantee
    # that an unseen key estimates as 0
    return (
        probes.join(F.broadcast(sketch), ["i", "b"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_count"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 64,
    top_k: int = 20,
) -> DataFrame:
    """Top-k keys by sketch-estimated frequency, with the exact count and
    the collision overestimate alongside (est_count >= true_count always —
    the one-sided error bound the sketch guarantees).

    The exact count here is the verification column for the gate; a real
    100 TB deployment keeps only the sketch and probes candidates, which
    is the point — the demo's exact groupBy is what the sketch REPLACES.
    """
    sketch = cms_build(df, key_col, depth=depth, width=width)
    # checkpoint the exact counts: they feed BOTH the estimate's probe
    # key set and the final comparison join, so without it the per-key
    # groupBy over the full input runs twice (r11 round, guide §2.4);
    # the frame is one row per distinct key — cheap to hold
    exact = (
        df.groupBy(key_col)
        .agg(F.count("*").alias("true_count"))
        .localCheckpoint()
    )
    est = cms_estimate(sketch, exact.select(key_col), key_col, depth=depth, width=width)
    return (
        est.join(exact, key_col)
        .select(
            key_col,
            "est_count",
            "true_count",
            (F.col("est_count") - F.col("true_count")).alias("overestimate"),
        )
        .orderBy(F.desc("est_count"), F.asc(key_col))
        .limit(top_k)
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge count-min sketches cell-wise. Sketches over the SAME hash
    family (depth, width, salt) are linear: sketch(A ∪ B) ==
    merge(sketch(A), sketch(B)) EXACTLY — the property that lets shards,
    days, or streaming micro-batches each sketch locally and combine with
    a 256-row union instead of re-scanning history."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("i", "b").agg(F.sum("cnt").alias("cnt"))


# ---------------------------------------------------------------------------
# Bloom filter: broadcast-sized set membership for join pruning.
# ---------------------------------------------------------------------------


def _bloom_h1_h2(key_str_col) -> tuple[F.Column, F.Column]:
    """Kirsch-Mitzenmacher double hashing from one md5: position_i =
    (h1 + i*h2) mod m. Both halves of the digest are < 2^32, h2 is forced
    odd so the probe stride cycles the whole table for power-of-two m."""
    h = F.md5(key_str_col)
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long").bitwiseOR(F.lit(1))
    return h1, h2


def bloom_build(
    df: DataFrame, key_col: str, *, m_bits: int = 1 << 18, k: int = 5
) -> DataFrame:
    """Aggregate a Bloom filter over ``df[key_col]`` as (word, bits) rows:
    word = bit_position // 32, bits = OR of 32-bit masks (32-bit words keep
    every value positive in both engines — bit 63 of a signed BIGINT is a
    cross-engine sign trap). At most m_bits/32 rows regardless of input
    size, so the sketch of a 100M-key dimension BROADCASTS (2^27 bits = 4M
    words ~ 64 MB worst case, far less when sparse) where the raw key set
    would not — the standard shape for pruning a shuffle-heavy semi join
    down to a broadcast prefilter. One shuffle, map-side combined, payload
    bounded by the word table size (the CMS argument).

    The hash family is md5-derived, so membership decisions — including
    WHICH keys false-positive — are reproducible in ANSI SQL across
    engines: the oracle gate checks the exact bit pattern, not a rate.
    """
    if m_bits & (m_bits - 1):
        raise ValueError("m_bits must be a power of two")
    h1, h2 = _bloom_h1_h2(F.col(key_col).cast("string"))
    pos = (
        (h1 + F.col("i") * h2) % m_bits
    )
    return (
        # NULL keys hash to NULL positions and would pollute the stored
        # sketch with a junk (NULL, NULL) word row — a set has no NULL
        # member; filter them at build
        df.filter(F.col(key_col).isNotNull())
        .select(F.col(key_col), F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"))
        .select(
            F.floor(pos / 32).cast("long").alias("word"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (pos % 32).cast("int")
            ).alias("m"),
        )
        .groupBy("word")
        .agg(F.bit_or("m").alias("bits"))
    )


def bloom_maybe_contains(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str,
    *,
    m_bits: int = 1 << 18,
    k: int = 5,
) -> DataFrame:
    """All ``probes`` columns plus ``maybe`` = Bloom membership verdict
    (no false negatives; false positives at the usual (1-e^{-kn/m})^k
    rate).

    Plan shape: k sequential BROADCAST left joins against the word table
    (words are unique after bloom_build's groupBy, so each join is 1:1) —
    an explode + per-key verdict agg would re-shuffle the probe side,
    which is exactly what a Bloom prefilter exists to avoid. All k joins
    fuse into the probe scan's stage; the probe side is never exchanged.
    """
    if m_bits & (m_bits - 1):
        raise ValueError("m_bits must be a power of two")
    h1, h2 = _bloom_h1_h2(F.col(key_col).cast("string"))
    out = probes
    hits = []
    for i in range(k):
        pos = (h1 + F.lit(i) * h2) % m_bits
        w = F.floor(pos / 32).cast("long")
        m = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 32).cast("int")
        )
        bi = bloom.select(
            F.col("word").alias(f"__w{i}"), F.col("bits").alias(f"__bits{i}")
        )
        out = (
            out.withColumn(f"__m{i}", m)
            .join(F.broadcast(bi), w == F.col(f"__w{i}"), "left")
        )
        hits.append(
            F.coalesce(F.col(f"__bits{i}"), F.lit(0)).bitwiseAND(
                F.col(f"__m{i}")
            )
            == F.col(f"__m{i}")
        )
    maybe = hits[0]
    for h in hits[1:]:
        maybe = maybe & h
    drop = [c for i in range(k) for c in (f"__w{i}", f"__bits{i}", f"__m{i}")]
    # a NULL probe key has NULL hash positions -> NULL verdict; a set has
    # no NULL member, so the verdict is definitively False (otherwise a
    # filter on ~maybe silently drops NULL-key rows from BOTH branches)
    return out.withColumn("maybe", F.coalesce(maybe, F.lit(False))).drop(*drop)


def bloom_prune_join(
    big: DataFrame,
    small: DataFrame,
    key_col: str,
    *,
    m_bits: int = 1 << 18,
    k: int = 5,
) -> DataFrame:
    """Semi join ``big`` to ``small`` on ``key_col`` with a Bloom prefilter:
    the big side is first cut to Bloom survivors via the BROADCAST word
    table (no shuffle of the big side), then exactly verified against the
    true key set, so the result EQUALS big.join(small, key, 'left_semi').

    When ``small`` is broadcastable raw, use a plain broadcast semi join —
    this operator is for the regime where the key set is 10-100x too big
    to broadcast but its m/32-word sketch is not: the full-table shuffle
    only ever sees the (1 + fp_rate) * |matching| surviving fraction."""
    survivors = bloom_maybe_contains(
        bloom_build(small.select(key_col), key_col, m_bits=m_bits, k=k),
        big,
        key_col,
        m_bits=m_bits,
        k=k,
    ).filter("maybe").drop("maybe")
    # no distinct() on the semi-join side: left_semi already emits one row
    # per surviving left row regardless of right-side duplicates, and the
    # key set is too big to pay an extra shuffle for nothing
    return survivors.join(small.select(key_col), key_col, "left_semi")


# ---------------------------------------------------------------------------
# HyperLogLog: fixed-size distinct-count sketch with integer-exact registers.
# ---------------------------------------------------------------------------


def _hll_parts(key_str_col, m: int) -> tuple[F.Column, F.Column]:
    """(bucket, rho): bucket from the first md5 word, rho = 1 + leading
    zeros of the second 32-bit word — integer-exact via base-2 digit count
    (33 - bitlen), never a float log."""
    h = F.md5(key_str_col)
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    w = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    bucket = (h1 % m).alias("bucket")
    rho = (
        F.when(w == 0, F.lit(33))
        .otherwise(F.lit(33) - F.length(F.conv(w, 10, 2)))
        .cast("long")
        .alias("rho")
    )
    return bucket, rho


def hll_build(
    df: DataFrame,
    key_col: str,
    *,
    m: int = 256,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Aggregate a HyperLogLog sketch: one (bucket, r) row per non-empty
    register, r = max rho (Flajolet et al. 2007). At most ``m`` rows per
    group regardless of cardinality — the COUNT(DISTINCT) replacement
    whose shuffle payload is constant. Mergeable: union + max(r) over the
    same hash family is EXACTLY the sketch of the union (the CMS linearity
    argument, with max instead of sum).

    Registers are integers derived from md5, so the sketch — and the
    estimate computed from it — is reproducible in ANSI SQL across
    engines, runs, and partitionings.
    """
    if m & (m - 1):
        raise ValueError("m must be a power of two")
    group_cols = group_cols or []
    bucket, rho = _hll_parts(F.col(key_col).cast("string"), m)
    return (
        df.select(*group_cols, bucket, rho)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("r"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge HLL sketches register-wise (max). Same hash family required."""
    if not sketches:
        raise ValueError("hll_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    gcols = [c for c in out.columns if c not in ("r",)]
    return out.groupBy(*gcols).agg(F.max("r").alias("r"))


def hll_estimate(
    sketch: DataFrame, *, m: int = 256, group_cols: list[str] | None = None
) -> DataFrame:
    """Cardinality estimate per group from an hll_build sketch.

    The harmonic sum is computed EXACTLY in integers: sum_j 2^(-r_j) over
    all m registers (empty register => r=0 => term 1) is scaled by 2^50,
    making every term 2^(50-r) a BIGINT and the sum order-independent —
    float accumulation order is the classic cross-engine divergence this
    sidesteps. The only float op is one literal-alpha multiply/divide on
    the integer sum, identical and correctly rounded in IEEE on both
    engines. No ln-based small-range correction in the gated column (libm
    log is not correctly-rounded portable); callers wanting it can apply
    m*ln(m/zeros) on the emitted integer ``zeros`` column themselves.

    Returns group_cols + (present, zeros, harmonic_scaled, est).
    """
    if m & (m - 1):
        raise ValueError("m must be a power of two")
    group_cols = group_cols or []
    alpha = 0.7213 / (1 + 1.079 / m)
    scaled = F.call_function(
        "shiftleft", F.lit(1).cast("long"), (F.lit(50) - F.col("r")).cast("int")
    )
    agg = sketch.groupBy(*group_cols).agg(
        F.count("*").alias("present"),
        F.sum(scaled).alias("__s_present"),
    )
    # empty registers contribute 2^50 each
    s_total = (
        F.col("__s_present")
        + (F.lit(m) - F.col("present")) * F.lit(1 << 50)
    )
    est = F.lit(alpha * m * m) * F.lit(float(1 << 50)) / s_total.cast("double")
    return agg.select(
        *group_cols,
        "present",
        (F.lit(m) - F.col("present")).alias("zeros"),
        s_total.cast("long").alias("harmonic_scaled"),
        F.round(est, 2).alias("est"),
    )


def cms_join_size(
    sketch_a: DataFrame, sketch_b: DataFrame, *, depth: int = 4
) -> DataFrame:
    """Equi-join cardinality estimation from two count-min sketches over
    the SAME hash family — the AMS/CMS inner-product estimator an
    optimizer consults before picking a join strategy: |A ⋈ B| ≈
    min over sketch rows of Σ_buckets cms_A[row][b] * cms_B[row][b].

    Guarantee shape: each row's inner product OVERCOUNTS (colliding keys
    multiply in), so the estimate is always >= the true join size, and
    collisions add at most |A|*|B|/width per row in expectation — the
    min over ``depth`` independent rows makes a large overshoot
    exponentially unlikely. Fixed hash family + fixed data ⇒ the
    estimate is a deterministic value, so it can ride a value gate.

    Cost: the sketches are <= depth*width rows EACH regardless of input
    size — the entire estimation is a kilobyte-scale cell join, no scan
    of either table. Returns one row: (est_join_size)."""
    prod = (
        sketch_a.alias("a")
        .join(
            sketch_b.alias("b"),
            (F.col("a.i") == F.col("b.i")) & (F.col("a.b") == F.col("b.b")),
        )
        .groupBy(F.col("a.i").alias("i"))
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("ip"))
    )
    # a sketch row with NO common non-empty cells has inner product 0 —
    # it must drive the min to 0, not vanish from it (sketches only
    # materialize non-empty cells, so the cell join can lose whole rows)
    return prod.agg(
        F.when(F.count("*") < depth, F.lit(0).cast("long"))
        .otherwise(F.min("ip"))
        .alias("est_join_size")
    )
