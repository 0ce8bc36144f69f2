"""Curation signals: PII scrub, benchmark decontamination, repetition
ratio — semantics on crafted rows plus the plan shapes that matter at
100 TB (benchmark side broadcast, no corpus shuffle on shingles)."""

from __future__ import annotations

from pyspark.sql import functions as F

from erigon_extract_spark.operators.curation import (
    decontaminate_against,
    repetition_ratio,
    scrub_pii,
)


def test_scrub_pii_redacts_and_counts(spark):
    rows = [
        (1, "mail a.b-c_d@ex-ample.org and 192.168.0.1 or call +44 20 7946 0958."),
        (2, "no pii here, just 3.14 and 1234567 plain digits"),
        (3, None),
        (4, "two mails x@y.io z@w.ai one ip 10.0.0.255"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert got[1]["n_emails"] == 1 and got[1]["n_ips"] == 1 and got[1]["n_phones"] == 1
    assert "<EMAIL>" in got[1]["scrubbed"]
    assert "<IP>" in got[1]["scrubbed"]
    assert "<PHONE>" in got[1]["scrubbed"]
    assert "a.b-c_d@ex-ample.org" not in got[1]["scrubbed"]
    # 3.14 must NOT look like an IP; free digit runs must NOT look like phones
    assert got[2]["scrubbed"] == rows[1][1]
    assert got[2]["n_emails"] == got[2]["n_ips"] == got[2]["n_phones"] == 0
    assert got[3]["scrubbed"] is None
    assert got[4]["n_emails"] == 2 and got[4]["n_ips"] == 1


def test_decontaminate_flags_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # verbatim copy of a benchmark span → fully contaminated
            (10, "the quick brown fox jumps over the lazy dog tonight"),
            # disjoint text → zero overlap
            (11, "completely different words about spark shuffles and parquet files"),
            # empty after normalization → drops out (no shingles)
            (12, "   "),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in decontaminate_against(corpus, bench, shingle_n=5).collect()
    }
    assert set(out) == {10, 11}
    assert out[10]["contaminated"] == 1
    assert out[10]["shared_shingles"] == out[10]["total_shingles"] > 0
    assert out[11]["contaminated"] == 0 and out[11]["shared_shingles"] == 0


def test_decontaminate_broadcasts_benchmark_side(spark):
    """The 100 TB property: the benchmark shingle set must BROADCAST so
    the corpus is never shuffled on shingles. A shuffled hash join here
    moves the whole corpus."""
    bench = spark.range(5).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma delta epsilon zeta "), F.col("id")).alias(
            "text"
        ),
    )
    corpus = spark.range(100, 200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("one two three four five six seven "), F.col("id")).alias(
            "text"
        ),
    )
    plan = decontaminate_against(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_repetition_ratio_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),  # 7 windows, 3 distinct → 4/7 repeated
            (2, "all words here are unique tokens"),  # no repeats → 0
            (3, "one two"),  # shorter than n → 0 by definition
            (4, None),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_ratio(df, n=3).collect()}
    assert got[1]["total_3grams"] == 7 and got[1]["distinct_3grams"] == 3
    assert abs(got[1]["repetition_ratio"] - round(1 - 3 / 7, 6)) < 1e-9
    assert got[2]["repetition_ratio"] == 0.0
    assert got[3]["total_3grams"] == 0 and got[3]["repetition_ratio"] == 0.0
    assert got[4]["repetition_ratio"] == 0.0


def test_length_band_filter_discrete_cutoffs(spark):
    """Cutoffs are the discrete percentile values (smallest v with
    cum*100 >= pct*n) and membership matches a python recomputation."""
    from erigon_extract_spark.operators.curation import length_band_filter

    lengths = [10] * 5 + list(range(100, 195)) + [10_000] * 5  # n=105
    docs = spark.createDataFrame(
        [(i, ln) for i, ln in enumerate(lengths)], "doc_id long, n_chars long"
    )
    out = length_band_filter(docs, lo_pct=5, hi_pct=95).collect()
    n = len(lengths)
    sl = sorted(lengths)
    cum, lo_cut, hi_cut = 0, None, None
    seen = {}
    for v in sl:
        seen[v] = seen.get(v, 0) + 1
    for v in sorted(seen):
        cum += seen[v]
        if lo_cut is None and cum * 100 >= 5 * n:
            lo_cut = v
        if hi_cut is None and cum * 100 >= 95 * n:
            hi_cut = v
    expect = {i for i, ln in enumerate(lengths) if lo_cut <= ln <= hi_cut}
    assert {r.doc_id for r in out} == expect
    assert all(r.lo_cut == lo_cut and r.hi_cut == hi_cut for r in out)
    # the 10k outliers and the 10s are trimmed
    assert all(lengths[r.doc_id] not in (10, 10_000) for r in out)


def test_blocklist_filter_word_boundaries(spark):
    from erigon_extract_spark.operators.curation import blocklist_filter

    docs = spark.createDataFrame(
        [
            (1, "clean text with nothing bad"),
            (2, "contains SpamWord twice: spamword!"),
            (3, "spamwordish is NOT a hit (boundary)"),
            (4, "phishbait and malwarelink and clickfarm"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in blocklist_filter(docs).collect()}
    assert out[1].keep and out[1].n_blocked_terms == 0
    assert not out[2].keep and out[2].n_blocked_terms == 2  # case-folded
    assert out[3].keep and out[3].n_blocked_terms == 0  # \b respected
    assert not out[4].keep and out[4].n_blocked_terms == 3
    # custom term list
    out2 = {r.doc_id: r.keep
            for r in blocklist_filter(docs, terms=["boundary"]).collect()}
    assert out2 == {1: True, 2: True, 3: False, 4: True}
    # uppercase terms are folded (text side is lowercased, so an unfolded
    # term could never match)
    out3 = {r.doc_id: r.keep
            for r in blocklist_filter(docs, terms=["BOUNDARY"]).collect()}
    assert out3 == out2
    # regex metacharacters would silently change the alternation's
    # semantics (or throw mid-job) -> rejected up front
    import pytest

    for bad in (["c++"], ["a.b"], ["x|y"], [""]):
        with pytest.raises(ValueError):
            blocklist_filter(docs, terms=bad)


def test_plan_token_mixture_budget_and_epochs(spark):
    from erigon_extract_spark.operators.sampling import plan_token_mixture

    docs = spark.createDataFrame(
        [(i, "w " * 100, "big" if i < 90 else "small")
         for i in range(100)]
        + [(900, "   ", "empty"), (901, None, "empty")],
        "doc_id long, text string, source string",
    )
    weights = spark.createDataFrame(
        [("big", 1), ("small", 3), ("empty", 2)],
        "source string, weight long",
    )
    out = {r.source: r for r in plan_token_mixture(
        docs, weights, token_budget=4000
    ).collect()}
    big, small = out["big"], out["small"]
    assert big.available_tokens == 9000 and small.available_tokens == 1000
    # targets: weight/total = 1/6, 3/6 of 4000
    assert big.target_tokens == 666 and small.target_tokens == 2000
    # abundant source: zero full epochs, residual subsample rate
    assert big.full_epochs == 0 and big.residual_permille == 74
    assert big.expected_tokens == 9000 * 74 // 1000
    # starved source: 2 full passes + residual partial pass, NO overshoot
    assert small.full_epochs == 2 and small.residual_permille == 0
    assert small.expected_tokens == 2000
    assert small.expected_tokens <= small.target_tokens
    # zero-supply source plans to zero instead of dividing by zero
    emp = out["empty"]
    assert emp.available_tokens == 0
    assert (emp.full_epochs, emp.residual_permille, emp.expected_tokens) \
        == (0, 0, 0)
    # overshoot bound: target just above supply stays within target
    w2 = spark.createDataFrame([("small", 1)], "source string, weight long")
    (p,) = plan_token_mixture(
        docs.filter(F.col("source") == "small"), w2, token_budget=1100
    ).collect()
    assert p.full_epochs == 1 and p.residual_permille == 100
    assert p.expected_tokens == 1000 + 1000 * 100 // 1000 == 1100


def test_route_by_language_thresholds_and_shards(spark):
    from erigon_extract_spark.operators.curation import route_by_language

    docs = spark.createDataFrame(
        [
            (0, "en", 0.50),   # en min 0.48 -> keep; shard 0 % 4 = 0
            (5, "en", 0.47),   # below en min -> drop; shard 5 % 4 = 1
            (7, "de", 0.51),   # de min 0.52 -> drop
            (9, "de", 0.52),   # exactly at min -> keep; shard 9 % 2 = 1
            (4, "und", 0.54),  # no policy row -> default 0.55 -> drop
            (6, "und", 0.55),  # default min meets -> keep; shard 6 % 1 = 0
        ],
        "doc_id long, lang_pred string, quality_score double",
    )
    policy = spark.createDataFrame(
        [("en", 0.48, 4), ("de", 0.52, 2)],
        "lang string, min_score double, n_shards int",
    )
    out = {r["doc_id"]: (r["keep"], r["shard"])
           for r in route_by_language(docs, policy).collect()}
    assert out == {
        0: (True, 0), 5: (False, 1), 7: (False, 1),
        9: (True, 1), 4: (False, 0), 6: (True, 0),
    }


def test_route_by_language_broadcasts_policy(spark):
    from erigon_extract_spark.operators.curation import route_by_language

    docs = spark.createDataFrame(
        [(1, "en", 0.6)], "doc_id long, lang_pred string, quality_score double"
    )
    policy = spark.createDataFrame(
        [("en", 0.5, 2)], "lang string, min_score double, n_shards int"
    )
    plan = (
        route_by_language(docs, policy)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_corpus_route_by_language_partition_invariance(spark, sf_dir):
    """The routed keep/shard decisions must be identical at any input
    parallelism: the classifier reduction is exact integer arithmetic
    and the routing is modular — nothing may depend on partition count
    or row order (VERDICT r7 #5)."""
    from erigon_extract_spark.queries import QUERIES

    fn = QUERIES["corpus_route_by_language"]
    base = {tuple(r) for r in fn(spark, sf_dir).collect()}
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        again = {tuple(r) for r in fn(spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    assert base == again and len(base) > 0


def test_leakage_safe_split_colocates_duplicates(spark, sf_dir):
    """Content-keyed split: every normalized-duplicate pair lands on the
    SAME side (an id-hash split demonstrably does not), split fractions
    are sane, and assignment is stable across partitionings."""
    from pyspark.sql import functions as F

    from erigon_extract_spark.operators.sampling import (
        leakage_safe_split,
        stable_split,
    )
    from erigon_extract_spark.operators.text import normalize_text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    dups = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.upper("text"), F.lit("   ")).alias("text"),
    )
    base = docs.unionByName(dups)

    s = leakage_safe_split(base, "text").withColumn(
        "fp", F.md5(normalize_text(F.col("text")))
    )
    straddle = (
        s.groupBy("fp")
        .agg(F.countDistinct("split").alias("n_sides"))
        .filter(F.col("n_sides") > 1)
        .count()
    )
    assert straddle == 0

    # the id-hash split DOES leak on the same data — the bug is real
    leaky = stable_split(base, "doc_id").withColumn(
        "fp", F.md5(normalize_text(F.col("text")))
    )
    leaked = (
        leaky.groupBy("fp")
        .agg(F.countDistinct("split").alias("n_sides"))
        .filter(F.col("n_sides") > 1)
        .count()
    )
    assert leaked > 0

    frac = {r.split: r.n for r in s.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    total = sum(frac.values())
    assert 0.7 < frac["train"] / total < 0.9
    assert set(frac) == {"train", "val", "test"}

    # partition-invariance: same assignment under a different layout
    again = {
        r.doc_id: r.split
        for r in leakage_safe_split(base.repartition(17), "text").collect()
    }
    first = {r.doc_id: r.split for r in s.collect()}
    assert again == first


def test_leakage_safe_split_assigns_null_and_empty_text(spark):
    """md5(NULL) is NULL, so an unguarded split leaves null-text rows
    with split=NULL — silently outside every split fraction. The
    operator coalesces the normalized text to '' first: null, empty,
    and whitespace-only texts are content-duplicates of each other, so
    they all land (non-null) in the SAME split."""
    from erigon_extract_spark.operators.sampling import leakage_safe_split

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "real text")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.split for r in leakage_safe_split(df, "text").collect()}
    assert all(v is not None for v in rows.values()), rows
    # null / empty / whitespace-only normalize identically -> one split
    assert rows[1] == rows[2] == rows[3]
