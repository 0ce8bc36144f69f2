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
    exact = df.groupBy(key_col).agg(F.count("*").alias("true_count"))
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
