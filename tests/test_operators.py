"""Operator-level tests over small synthetic frames (one shared session)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from erigon_extract_spark.operators.asof import as_of_join, state_at
from erigon_extract_spark.operators.asserts import (
    AssertionViolation,
    assert_contiguous,
    assert_empty,
    assert_unique_keys,
)
from erigon_extract_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from erigon_extract_spark.operators.multimodal import (
    extract_media_metadata,
    frame_sample_plan,
)
from erigon_extract_spark.operators.windows import delta_encode, delta_decode


def test_exact_dedup_keeps_min_id(spark):
    docs = spark.createDataFrame(
        [
            (1, "Hello  World"),
            (2, "hello world"),  # same after normalization
            (3, "HELLO WORLD "),
            (4, "something else"),
        ],
        "doc_id long, text string",
    )
    kept = sorted(r.doc_id for r in exact_dedup(docs).collect())
    assert kept == [1, 4]


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from a warm windowsill in the late afternoon sun of early spring"
    )
    rows = [
        (1, base),
        (2, base.replace("lazy", "sleepy")),  # near-dup of 1
        (3, "completely different content about spark query engines and "
            "distributed columnar execution at terabyte scale with shuffles"),
        (4, base),  # exact dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_lsh_finds_near_dups(spark, near_dup_docs):
    pairs = {
        (r.doc_id_a, r.doc_id_b)
        for r in minhash_lsh_candidates(
            near_dup_docs, n_hashes=16, bands=8, shingle_n=3
        ).collect()
    }
    assert (1, 4) in pairs  # exact dup always collides
    assert (1, 2) in pairs or (2, 4) in pairs  # near-dup collides w.h.p.
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_ngram_jaccard_scores(spark, near_dup_docs):
    got = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            near_dup_docs, shingle_n=3, threshold=0.5
        ).collect()
    }
    assert got[(1, 4)] == 1.0
    assert 0.5 <= got[(1, 2)] < 1.0
    assert (1, 3) not in got


def test_simhash_near_pairs(spark, near_dup_docs):
    pairs = {
        (r.doc_id_a, r.doc_id_b)
        for r in simhash_near_pairs(near_dup_docs, max_hamming=3, shingle_n=2).collect()
    }
    assert (1, 4) in pairs
    assert (1, 3) not in pairs


def test_as_of_join_backward_and_left_preserving(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 5)], "k int, t int"
    )
    right = spark.createDataFrame(
        [(1, 8, "a"), (1, 15, "b"), (1, 25, "c"), (3, 1, "z")],
        "k int, rt int, v string",
    )
    out = {
        (r.k, r.t): (r.rt, r.v)
        for r in as_of_join(left, right, ["k"], "t", "rt").collect()
    }
    assert out[(1, 10)] == (8, "a")
    assert out[(1, 20)] == (15, "b")
    assert out[(2, 5)] == (None, None)  # left row with no match survives


def test_state_at_ties_and_filter(spark):
    df = spark.createDataFrame(
        [(1, 5, "x"), (1, 9, "y"), (1, 12, "z"), (2, 20, "w")],
        "k int, ver int, v string",
    )
    out = {r.k: (r.ver, r.v) for r in state_at(df, ["k"], "ver", 10).collect()}
    assert out == {1: (9, "y")}


def test_delta_encode_decode_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, 1, 10), (1, 2, 17), (1, 3, 17), (2, 1, 5), (2, 2, 3)],
        "k int, seq int, v long",
    )
    enc = delta_encode(df, ["k"], ["seq"], "v", out_col="d")
    dec = delta_decode(enc, ["k"], ["seq"], "d", out_col="v2")
    bad = dec.filter(F.col("v") != F.col("v2")).count()
    assert bad == 0


def test_asserts(spark):
    df = spark.createDataFrame([(1, 1), (1, 2), (2, 1)], "k int, s int")
    assert_unique_keys(df, ["k", "s"])
    with pytest.raises(AssertionViolation):
        assert_unique_keys(df, ["k"])
    assert_contiguous(df, "s", ["k"])
    gap = spark.createDataFrame([(1, 1), (1, 3)], "k int, s int")
    with pytest.raises(AssertionViolation):
        assert_contiguous(gap, "s", ["k"])
    assert_empty(df.filter(F.col("k") > 99))


def test_multimodal_metadata_and_frame_plan(spark):
    media = spark.createDataFrame(
        [
            Row(doc_id=1, mime="video/fake", payload=b"\x01\x02\x03" * 40),
            Row(doc_id=2, mime="image/fake", payload=b"\xff" * 10),
            Row(doc_id=3, mime="image/fake", payload=None),
        ]
    )
    meta = {r.doc_id: r for r in extract_media_metadata(media).collect()}
    assert meta[1].n_bytes == 120 and meta[1].width >= 64
    assert meta[3].decode_error == "null payload"
    # determinism: same payload → same fake probe
    again = {r.doc_id: r for r in extract_media_metadata(media).collect()}
    assert meta[1].width == again[1].width
    frames = frame_sample_plan(media, every_ms=10_000).collect()
    assert all(f.frame_ts_ms % 10_000 == 0 for f in frames)


def test_multimodal_resize_stub(spark):
    from pyspark.sql import functions as F

    from erigon_extract_spark.operators.multimodal import resize_images

    media = spark.createDataFrame(
        [(1, "image/png", b"payload-bytes-1"), (2, "image/png", None)],
        "doc_id long, mime string, payload binary",
    )
    out = {r.doc_id: r for r in resize_images(media, 224, 224).collect()}
    ok = out[1]
    assert (ok.target_w, ok.target_h) == (224, 224)
    assert ok.resize_error is None
    # deterministic fake payload: dims header + content digest
    assert len(ok.payload) == 12
    assert int.from_bytes(bytes(ok.payload)[:4], "big") == 224
    bad = out[2]
    assert bad.payload is None and bad.resize_error == "null payload"
    # real-decode of an unsupported format quarantines per-row (the
    # error column names the PIL gap), never fails the whole job
    real = {r.doc_id: r for r in resize_images(
        media, fake_decode=False
    ).collect()}
    assert real[1].payload is None and "PIL" in real[1].resize_error
    assert real[2].resize_error == "null payload"


def test_lsh_bucket_cap_drops_degenerate_boilerplate(spark):
    """A boilerplate corpus (every doc identical) lands in one LSH bucket;
    the default cap must keep that bucket from emitting O(k^2) pairs, and
    cap=None must restore the exhaustive behavior."""
    n = 30
    docs = spark.createDataFrame(
        [(i, "the same license header repeated verbatim in every file") for i in range(n)]
        + [(1000, "a completely different document about spark physical plans")],
        "doc_id int, text string",
    )
    capped = minhash_lsh_candidates(docs, shingle_n=2, max_bucket_size=10)
    assert capped.count() == 0
    uncapped = minhash_lsh_candidates(docs, shingle_n=2, max_bucket_size=None)
    assert uncapped.count() == n * (n - 1) // 2

    sim_capped = simhash_near_pairs(docs, shingle_n=2, max_bucket_size=10)
    assert sim_capped.count() == 0
    sim_uncapped = simhash_near_pairs(docs, shingle_n=2, max_bucket_size=None)
    assert sim_uncapped.count() == n * (n - 1) // 2


def test_ngram_jaccard_prefix_filter_is_exact(spark, near_dup_docs):
    """Prefix filtering must be a pure optimization: identical pairs and
    jaccard values vs the naive inverted-index join, at several
    thresholds, including a boilerplate-heavy corpus."""
    docs = near_dup_docs.unionByName(
        spark.createDataFrame(
            [(100 + i, "common header text shared by every appended doc "
              + f"unique tail {i}") for i in range(8)],
            "doc_id int, text string",
        )
    )
    for t in (0.2, 0.5, 0.8):
        fast = {
            (r.doc_id_a, r.doc_id_b): round(r.jaccard, 9)
            for r in ngram_jaccard_pairs(
                docs, shingle_n=2, threshold=t, prefix_filter=True
            ).collect()
        }
        naive = {
            (r.doc_id_a, r.doc_id_b): round(r.jaccard, 9)
            for r in ngram_jaccard_pairs(
                docs, shingle_n=2, threshold=t, prefix_filter=False
            ).collect()
        }
        assert fast == naive, (t, fast, naive)
    assert naive  # the corpus must actually produce pairs at the last t


def test_ngram_jaccard_prefix_length_float_boundary(spark):
    """Regression: binary floats make (1.0-0.8)*10 = 1.9999999999999996,
    so the bare floor(n*(1-t))+1 prefix was ONE SHORTER than the theorem
    requires and provably dropped a true pair. Fixture: A's 8 3-shingles
    are a subset of B's 10 (jaccard exactly 0.8); B's two non-shared
    shingles are rarest (df=1 < df=2) so they occupy prefix ranks 1-2 and
    the first SHARED shingle sits at rank 3 — inside the correct prefix
    length floor(10*0.2)+1 = 3, outside the float-shortfall length 2."""
    words = [f"w{i:02d}" for i in range(12)]
    docs = spark.createDataFrame(
        [(1, " ".join(words)), (2, " ".join(words[2:]))],
        "doc_id int, text string",
    )
    got = {
        (r.doc_id_a, r.doc_id_b): round(r.jaccard, 9)
        for r in ngram_jaccard_pairs(
            docs, shingle_n=3, threshold=0.8, prefix_filter=True
        ).collect()
    }
    assert got == {(1, 2): 0.8}, got


def test_connected_components_chain_and_islands(spark):
    from erigon_extract_spark.operators.graph import (
        connected_components,
        dedup_clusters,
    )

    # chain 1-2-3-4 (diameter 3), island pair 10-11, singleton 99 via all_ids
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "doc_id_a int, doc_id_b int"
    )
    comp = {
        r.node: r.component for r in connected_components(pairs).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    all_ids = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 10, 11, 99)],
                                    "doc_id int")
    clusters = {
        r.doc_id: r.cluster
        for r in dedup_clusters(pairs, all_ids=all_ids).collect()
    }
    assert clusters[99] == 99 and clusters[4] == 1 and clusters[11] == 10


def test_cc_star_matches_minlabel_in_fewer_rounds(spark):
    """VERDICT r5 #8: the large-star/small-star option must (a) produce
    the identical labeling on every topology minlabel handles, and (b)
    converge in strictly fewer rounds on a long path — the general-graph
    regime (diameter >> log n) the option exists for."""
    from erigon_extract_spark.operators.graph import (
        _cc_minlabel,
        _cc_star,
        connected_components,
    )

    # path 0-1-...-14 (diameter 14) + an island pair + a triangle
    # + a self-loop-only node (both methods must emit its singleton row)
    edges = [(i, i + 1) for i in range(14)] + [(100, 101), (50, 51),
                                               (51, 52), (50, 52),
                                               (200, 200)]
    pairs = spark.createDataFrame(edges, "doc_id_a int, doc_id_b int")

    ml, ml_rounds = _cc_minlabel(pairs, "doc_id_a", "doc_id_b", 40)
    st, st_rounds = _cc_star(pairs, "doc_id_a", "doc_id_b", 40)
    want = {r.node: r.component for r in ml.collect()}
    got = {r.node: r.component for r in st.collect()}
    assert got == want
    assert want[14] == 0 and want[101] == 100 and want[52] == 50
    assert want[200] == 200 and got[200] == 200
    assert st_rounds < ml_rounds, (st_rounds, ml_rounds)

    # the public surface routes by method and rejects unknowns
    via_api = {
        r.node: r.component
        for r in connected_components(pairs, method="star").collect()
    }
    assert via_api == want
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown method"):
        connected_components(pairs, method="bogus")


def test_duplicate_spans_finds_shared_region(spark):
    """Two docs share a 135-char verbatim region (at different, unaligned
    offsets); a third doc repeats text only WITHIN itself. At stride=1
    (the exact setting) the shared region must come back as ONE maximal
    merged span per sharing doc with exact boundaries, and the
    self-repeating doc must produce no spans (duplication is cross-doc)."""
    from erigon_extract_spark.operators.dedup import duplicate_spans

    # leading space inside `shared` + prefixes ending in DIFFERENT non-space
    # chars ('1' vs '2') + suffixes differing at their first char: the
    # maximal cross-doc substring is exactly `shared`, nothing more
    shared = " " + "the quick brown fox jumps over the lazy dog " * 3
    uniq_a = "alpha bravo charlie delta echo foxtrot golf hotel india1"
    uniq_b = "zulu yankee xray whiskey victor uniform tango sierra2"
    docs = spark.createDataFrame(
        [
            (1, uniq_a + shared + "end marker one"),
            (2, uniq_b + shared + "closing words two"),
            (3, "completely distinct text with no shared content here "
                "repeated only within itself never across " * 3),
        ],
        "doc_id long, text string",
    )
    width = 40
    spans = duplicate_spans(docs, width=width, stride=1).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {1, 2}
    for prefix, doc_id in ((uniq_a, 1), (uniq_b, 2)):
        rows = by_doc[doc_id]
        assert len(rows) == 1, rows
        start = len(prefix) + 1  # 1-based offset of the shared region
        # last matching gram starts at region_end - width + 1
        assert rows[0].span_start == start
        assert rows[0].span_end == start + len(shared) - 1
        assert rows[0].span_len == len(shared)


def test_duplicate_spans_short_docs_no_grams(spark):
    from erigon_extract_spark.operators.dedup import duplicate_spans

    docs = spark.createDataFrame(
        [(1, "short"), (2, "short")], "doc_id long, text string"
    )
    assert duplicate_spans(docs, width=40, stride=10).count() == 0


def test_hashed_linear_quality_order_independent(spark):
    """Integer weight sums ⇒ the score is bit-identical regardless of
    partitioning/accumulation order (the claim the operator is built on)."""
    from erigon_extract_spark.operators.text import hashed_linear_quality

    docs = spark.createDataFrame(
        [(i, f"token{j} common word filler text number {i * j % 7}")
         for i in range(1, 21) for j in (i,)],
        "doc_id long, text string",
    )
    a = {r.doc_id: r for r in hashed_linear_quality(docs).collect()}
    b = {
        r.doc_id: r
        for r in hashed_linear_quality(docs.repartition(13)).collect()
    }
    assert set(a) == set(b) and len(a) == 20
    for k in a:
        assert a[k].weight_sum == b[k].weight_sum
        assert a[k].quality_score == b[k].quality_score
        assert 0.0 <= a[k].quality_score <= 1.0
        assert a[k].keep == (a[k].quality_score >= 0.5)


def test_cms_one_sided_error_and_exact_when_wide(spark):
    """CMS guarantees est >= true for every key; with width >> keys the
    probability of any collision is tiny, making estimates exact."""
    from erigon_extract_spark.operators.sketch import cms_heavy_hitters

    rows = [(k,) for k in range(30) for _ in range(k + 1)]
    df = spark.createDataFrame(rows, "user_id long")
    # tight sketch: collisions guaranteed (30 keys into 8 buckets)
    tight = cms_heavy_hitters(df, "user_id", depth=2, width=8, top_k=30).collect()
    assert len(tight) == 30
    assert all(r.overestimate >= 0 for r in tight)
    assert any(r.overestimate > 0 for r in tight)  # collisions happened
    assert all(r.est_count == r.true_count + r.overestimate for r in tight)
    # wide sketch: no collisions in practice -> exact
    wide = cms_heavy_hitters(df, "user_id", depth=4, width=4096, top_k=30).collect()
    assert all(r.overestimate == 0 for r in wide)
    got = {r.user_id: r.true_count for r in wide}
    assert got == {k: k + 1 for k in range(30)}


def test_strip_boilerplate_removes_frequent_keeps_order(spark):
    from erigon_extract_spark.operators.text import strip_boilerplate

    boiler = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [
            (1, f"unique alpha. {boiler}. unique beta"),
            (2, f"{boiler}. middle text two. closing two"),
            (3, f"opening three. {boiler}. done three"),
            (4, "no template here. just content. nothing shared"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in strip_boilerplate(docs, min_docs=3).collect()}
    assert out[1].kept_text == "unique alpha. unique beta"
    assert out[2].kept_text == "middle text two. closing two"
    assert out[3].kept_text == "opening three. done three"
    assert out[4].kept_text == "no template here. just content. nothing shared"
    assert out[1].n_sentences == 3 and out[1].n_removed == 1
    assert out[4].n_removed == 0
    # all-boilerplate doc -> empty string, not a dropped row
    docs2 = docs.union(
        spark.createDataFrame([(5, boiler)], "doc_id long, text string")
    )
    out2 = {r.doc_id: r for r in strip_boilerplate(docs2, min_docs=3).collect()}
    assert out2[5].kept_text == "" and out2[5].n_removed == 1


def test_cms_merge_is_exact_union(spark):
    """Sketch linearity: merging per-shard sketches equals sketching the
    union — cell-for-cell, not approximately."""
    from erigon_extract_spark.operators.sketch import cms_build, cms_merge

    a = spark.createDataFrame([(k % 7,) for k in range(100)], "user_id long")
    b = spark.createDataFrame([(k % 11,) for k in range(80)], "user_id long")
    merged = {
        (r.i, r.b): r.cnt
        for r in cms_merge(
            cms_build(a, "user_id", depth=3, width=16),
            cms_build(b, "user_id", depth=3, width=16),
        ).collect()
    }
    whole = {
        (r.i, r.b): r.cnt
        for r in cms_build(a.union(b), "user_id", depth=3, width=16).collect()
    }
    assert merged == whole


def test_shuffle_order_is_deterministic_permutation(spark):
    from erigon_extract_spark.operators.sampling import shuffle_order

    docs = spark.createDataFrame([(i, "x") for i in range(500)],
                                 "doc_id long, text string")
    a = {(r.shard, r.shard_pos): r.doc_id
         for r in shuffle_order(docs, "doc_id").collect()}
    b = {(r.shard, r.shard_pos): r.doc_id
         for r in shuffle_order(docs.repartition(17), "doc_id").collect()}
    assert a == b  # partitioning-independent
    assert len(a) == 500  # (shard, pos) is a bijection onto the corpus
    assert sorted(a.values()) == list(range(500))
    # every shard non-degenerate and positions contiguous from 1
    from collections import Counter

    per_shard = Counter(s for s, _ in a)
    assert set(per_shard) == set(range(8))
    for s, n in per_shard.items():
        assert {p for sh, p in a if sh == s} == set(range(1, n + 1))
    # a different seed produces a different permutation
    c = {(r.shard, r.shard_pos): r.doc_id
         for r in shuffle_order(docs, "doc_id", seed="shuf2").collect()}
    assert c != a


def test_bigram_familiarity_hand_check(spark):
    from erigon_extract_spark.operators.text import bigram_familiarity

    docs = spark.createDataFrame(
        [
            (1, "a b c"),       # bigrams: "a b", "b c"
            (2, "a b"),         # bigram:  "a b"
            (3, "z"),           # too short -> no row
            (4, "q r q r"),     # "q r" x2, "r q" x1
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_familiarity(docs).collect()}
    assert 3 not in out
    # model: "a b"->2, "b c"->1, "q r"->2, "r q"->1
    assert (out[1].n_bigrams, out[1].familiarity_sum) == (2, 3)
    assert out[1].familiarity == 1.5
    assert (out[2].n_bigrams, out[2].familiarity_sum) == (1, 2)
    assert (out[4].n_bigrams, out[4].familiarity_sum) == (3, 5)
    assert out[4].familiarity == round(5 / 3, 6)


def test_profile_table_nulls_distincts_ranges(spark):
    from erigon_extract_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (3, "b", 7.5), (4, None, 7.5)],
        "id long, s string, v double",
    )
    prof = {r.col_name: r for r in profile_table(df).collect()}
    assert set(prof) == {"id", "s", "v"}
    assert all(r.n_rows == 4 for r in prof.values())
    assert (prof["id"].n_nulls, prof["id"].n_distinct) == (0, 4)
    assert (prof["s"].n_nulls, prof["s"].n_distinct) == (1, 2)
    assert (prof["v"].n_nulls, prof["v"].n_distinct) == (1, 2)
    assert prof["id"].min_s == "1" and prof["id"].max_s == "4"
    assert prof["s"].min_s == "a" and prof["s"].max_s == "b"
    # approx mode: same shape, cardinalities within HLL tolerance
    approx = {r.col_name: r for r in profile_table(df, exact=False).collect()}
    for c in prof:
        assert abs(approx[c].n_distinct - prof[c].n_distinct) <= 1


def test_snapshot_diff_statuses(spark):
    from erigon_extract_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
        "k long, s string, v long",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "CHANGED", None), (4, "d", None), (5, "e", 50)],
        "k long, s string, v long",
    )
    got = {r.k: r.status for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "changed",       # value change
        4: "changed",       # non-null -> null (sentinel distinguishes)
        5: "added",
    }
    # restricting compare columns ignores the v difference for key 4
    got2 = {r.k: r.status
            for r in snapshot_diff(old, new, ["k"], ["s"]).collect()}
    assert got2[4] == "unchanged" and got2[3] == "changed"


def test_balanced_sample_caps_and_append_stability(spark):
    from erigon_extract_spark.operators.sampling import balanced_sample

    rows = [(i, "en" if i % 4 else "de", f"s{i % 2}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    out = balanced_sample(df, ["lang", "source"], "doc_id", 15).collect()
    from collections import Counter

    per = Counter((r.lang, r.source) for r in out)
    assert all(n <= 15 for n in per.values())
    assert per[("de", "s0")] == 15 and per[("en", "s1")] == 15
    # append stability: grow the corpus; a group NOT at its cap keeps all
    # prior picks, and every still-selected old row was selected before
    bigger = df.union(spark.createDataFrame(
        [(i, "fr", "s9") for i in range(1000, 1010)],
        "doc_id long, lang string, source string",
    ))
    out2 = {r.doc_id for r in balanced_sample(
        bigger, ["lang", "source"], "doc_id", 15
    ).collect()}
    first = {r.doc_id for r in out}
    assert first <= out2  # old picks survive (no old group grew)
    assert all(1000 <= d < 1010 for d in out2 - first)


def test_cms_estimate_unseen_key_is_zero(spark):
    from pyspark.sql import functions as F

    from erigon_extract_spark.operators.sketch import cms_build, cms_estimate

    data = spark.createDataFrame([(k % 5,) for k in range(50)], "user_id long")
    sketch = cms_build(data, "user_id", depth=3, width=64)
    probes = spark.createDataFrame(
        [(0,), (999,), (12345,)], "user_id long"
    )
    est = {r.user_id: r.est_count
           for r in cms_estimate(sketch, probes, "user_id",
                                 depth=3, width=64).collect()}
    assert set(est) == {0, 999, 12345}  # unseen keys are NOT dropped
    assert est[0] >= 10  # true count of key 0
    # wide sketch, tiny key set: unseen keys' cells are empty -> exactly 0
    assert est[999] == 0 and est[12345] == 0


def test_chunk_documents_overlap_and_coverage(spark):
    from erigon_extract_spark.operators.text import chunk_documents

    words = [f"w{i}" for i in range(150)]
    docs = spark.createDataFrame(
        [(1, " ".join(words)), (2, "short doc"), (3, "   ")],
        "doc_id long, text string",
    )
    out = [r for r in chunk_documents(
        docs, chunk_tokens=64, stride=48
    ).collect()]
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 3 not in by_doc  # whitespace-only doc yields nothing
    # doc 2: one partial chunk covering both tokens
    (c2,) = by_doc[2]
    assert (c2.chunk_idx, c2.chunk_start_token, c2.n_chunk_tokens) == (0, 1, 2)
    assert c2.chunk_text == "short doc"
    # doc 1: the stride grid is 1, 49, 97, 145 — but the 145-start window
    # (6 tokens, 145-150) is fully inside the 97-start window's 97-150
    # coverage, so it is dropped (n_chunk_tokens <= chunk - stride adds
    # no new tokens, only duplicate embedding input). Coverage stays full.
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [r.chunk_start_token for r in c1] == [1, 49, 97]
    assert [r.n_chunk_tokens for r in c1] == [64, 64, 54]
    covered = set()
    for r in c1:
        covered.update(range(r.chunk_start_token,
                             r.chunk_start_token + r.n_chunk_tokens))
    assert covered == set(range(1, 151))  # every token in >= 1 chunk
    assert c1[0].chunk_text.split() == words[:64]
    assert c1[1].chunk_text.split() == words[48:112]


def test_top_terms_tfidf_ranking(spark):
    from erigon_extract_spark.operators.text import top_terms

    # "the" appears in all 4 docs -> dropped by the majority-df cutoff.
    # Per doc, ranking is (tf DESC, df ASC, term ASC).
    docs = spark.createDataFrame(
        [
            (1, "the cat cat cat dog zebra"),
            (2, "the dog dog zebra"),
            (3, "the bird"),
            (4, "the fish fish bird"),
        ],
        "doc_id long, text string",
    )
    out = top_terms(docs, k=2)
    rows = {(r.doc_id, r.term_rank): r for r in out.collect()}
    # doc 1: cat tf=3 beats dog/zebra tf=1; zebra (df=2) vs dog (df=2)
    # ties on df -> term ASC puts dog second
    assert rows[(1, 1)].term == "cat" and rows[(1, 1)].tf == 3
    assert rows[(1, 2)].term == "dog"
    # doc 2: dog tf=2 first, zebra second
    assert rows[(2, 1)].term == "dog" and rows[(2, 2)].term == "zebra"
    # doc 3: only "bird" survives -> a single row, no rank-2 padding
    assert rows[(3, 1)].term == "bird" and (3, 2) not in rows
    # "the" (df=4, 2*4 > 4) never appears anywhere
    assert all(r.term != "the" for r in rows.values())
    # df column reports corpus document frequency, not in-doc count
    assert rows[(4, 1)].term == "fish" and rows[(4, 1)].df == 1
    assert rows[(3, 1)].df == 2  # bird is in docs 3 and 4
    # ttf is corpus-wide term frequency: dog = 1 (doc 1) + 2 (doc 2)
    assert rows[(2, 1)].ttf == 3 and rows[(3, 1)].ttf == 2


def test_bloom_no_false_negatives_and_deterministic_fps(spark):
    from erigon_extract_spark.operators.sketch import (
        bloom_build,
        bloom_maybe_contains,
    )

    members = spark.range(0, 500).select(F.col("id").alias("key"))
    bloom = bloom_build(members, "key", m_bits=1 << 12, k=4)
    # word table bounded by m/32 regardless of input size
    assert bloom.count() <= (1 << 12) // 32
    probes = spark.range(0, 2000).select(F.col("id").alias("key"))
    out = {r.key: r.maybe for r in bloom_maybe_contains(
        bloom, probes, "key", m_bits=1 << 12, k=4
    ).collect()}
    # every member reports maybe=True — the Bloom guarantee
    assert all(out[i] for i in range(500))
    # small m forced some false positives; they are md5-deterministic, so
    # two independent evaluations agree on WHICH keys false-positive
    fps = {i for i in range(500, 2000) if out[i]}
    assert fps, "with m=4096/n=500 the fp rate cannot be zero"
    out2 = {r.key: r.maybe for r in bloom_maybe_contains(
        bloom, probes, "key", m_bits=1 << 12, k=4
    ).collect()}
    assert out == out2
    # NULL keys: excluded from the build (no junk word row), and a NULL
    # probe verdicts False (a set has no NULL member), never NULL
    with_null = spark.createDataFrame(
        [(1,), (None,)], "key long"
    )
    bn = bloom_build(with_null, "key", m_bits=1 << 12, k=4)
    assert all(r.word is not None and r.bits is not None
               for r in bn.collect())
    verdicts = {r.key: r.maybe for r in bloom_maybe_contains(
        bn, with_null, "key", m_bits=1 << 12, k=4
    ).collect()}
    assert verdicts[1] is True and verdicts[None] is False


def test_bloom_prune_join_equals_semi_join(spark):
    from erigon_extract_spark.operators.sketch import bloom_prune_join

    big = spark.range(0, 5000).select(
        F.col("id").alias("key"), (F.col("id") * 7 % 100).alias("payload")
    )
    small = spark.createDataFrame(
        [(i * 13,) for i in range(200)], "key long"
    )
    got = bloom_prune_join(big, small, "key", m_bits=1 << 12, k=4)
    want = big.join(small, "key", "left_semi")
    assert sorted((r.key, r.payload) for r in got.collect()) == sorted(
        (r.key, r.payload) for r in want.collect()
    )


def test_bloom_probe_side_never_shuffles(spark):
    from erigon_extract_spark.operators.sketch import (
        bloom_build,
        bloom_maybe_contains,
    )

    members = spark.range(0, 100).select(F.col("id").alias("key"))
    probes = spark.range(0, 1000).select(F.col("id").alias("key"))
    out = bloom_maybe_contains(
        bloom_build(members, "key", m_bits=1 << 12, k=4),
        probes, "key", m_bits=1 << 12, k=4,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the k word-table joins must all be broadcast joins; any
    # SortMergeJoin / ShuffledHashJoin means the probe side got exchanged
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 4


def test_hll_accuracy_merge_and_register_bound(spark):
    from erigon_extract_spark.operators.sketch import (
        hll_build,
        hll_estimate,
        hll_merge,
    )

    n = 20_000
    keys = spark.range(n).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    sk = hll_build(keys, "k", m=256)
    assert sk.count() <= 256
    (row,) = hll_estimate(sk, m=256).collect()
    # standard error ~ 1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert abs(row.est - n) / n < 0.20
    # duplicates don't move the sketch: distinct-count, not row-count
    dup = keys.union(keys)
    (row_dup,) = hll_estimate(hll_build(dup, "k", m=256), m=256).collect()
    assert row_dup.est == row.est
    # merge = sketch of the union, register for register
    a = keys.filter(F.col("k") < "k5")
    b = keys.filter(F.col("k") >= "k5")
    merged = hll_merge(hll_build(a, "k", m=256), hll_build(b, "k", m=256))
    assert sorted((r.bucket, r.r) for r in merged.collect()) == sorted(
        (r.bucket, r.r) for r in sk.collect()
    )


def test_winnowing_guarantee_density_and_reference(spark):
    """The Schleimer et al. guarantee: any shared substring of length
    >= w + k - 1 yields a shared fingerprint; selection matches an
    independent python reference (min-per-window, rightmost ties)."""
    import hashlib
    import random
    import re as _re

    from erigon_extract_spark.operators.dedup import winnowing_fingerprints

    k, w = 5, 4

    def ref_fps(text):
        t = _re.sub(r"\s+", " ", text.lower()).strip()
        if len(t) < k:
            return set()
        hs = [
            int(hashlib.md5(t[i:i + k].encode()).hexdigest()[:8], 16)
            for i in range(len(t) - k + 1)
        ]
        out = set()
        for p in range(max(len(hs) - w + 1, 1)):
            window = hs[p:p + w]
            mh = min(window)
            # rightmost occurrence of the min
            mi = max(i for i, h in enumerate(window) if h == mh)
            out.add((p + mi + 1, mh))
        return out

    rng = random.Random(7)
    shared = "a very distinctive shared passage here"
    rows = [
        (1, "prefix one " + shared + " suffix alpha"),
        (2, "totally different opening " + shared + " and ending"),
        (3, "".join(rng.choice("abcdef ") for _ in range(200))),
        (4, "tiny"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in winnowing_fingerprints(docs, k=k, w=w).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.gram_hash))
    # exact match vs the reference implementation, every doc
    for doc_id, text in rows:
        assert got.get(doc_id, set()) == ref_fps(text), doc_id
    # guarantee: docs 1 and 2 share a long substring -> shared fingerprint
    h1 = {h for _, h in got[1]}
    h2 = {h for _, h in got[2]}
    assert h1 & h2
    # density: roughly 2/(w+1) of grams selected on random text
    n_grams = len(_re.sub(r"\s+", " ", rows[2][1].lower()).strip()) - k + 1
    assert len(got[3]) < 0.6 * n_grams


def test_intervalize_scd2_semantics(spark):
    from erigon_extract_spark.operators.windows import intervalize

    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 35, "c"), (2, 5, "x")],
        "k long, v long, s string",
    )
    out = sorted(
        intervalize(df, ["k"], "v", ["s"]).collect(),
        key=lambda r: (r.k, r.valid_from),
    )
    rows = [(r.k, r.valid_from, r.valid_to, r.s, r.is_current) for r in out]
    assert rows == [
        (1, 10, 20, "a", False),
        (1, 20, 35, "b", False),
        (1, 35, None, "c", True),
        (2, 5, None, "x", True),
    ]
    # interval lookup == state_at for any t: t=22 -> version 20 ('b')
    from erigon_extract_spark.operators.asof import state_at

    got = intervalize(df, ["k"], "v", ["s"]).filter(
        (F.col("valid_from") <= 22)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > 22))
    )
    want = state_at(df, ["k"], "v", 22)
    assert sorted((r.k, r.s) for r in got.collect()) == sorted(
        (r.k, r.s) for r in want.collect()
    )


def test_triangle_count_reference_and_star_graph(spark):
    import itertools
    import random

    from erigon_extract_spark.operators.graph import triangle_count

    rng = random.Random(11)
    n = 40
    edges = {(a, b) for a in range(n) for b in range(n)
             if a < b and rng.random() < 0.15}
    # python reference
    adj = {v: set() for v in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expect = sum(
        1 for a, b, c in itertools.combinations(range(n), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "src long, dst long"
    )
    (row,) = triangle_count(df).collect()
    assert row.n_triangles == expect
    # star graph: hub of degree 50, zero triangles (orientation keeps the
    # hub's wedge set empty rather than deg^2)
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 51)], "src long, dst long"
    )
    (srow,) = triangle_count(star).collect()
    assert srow.n_triangles == 0


def test_multimodal_real_png_kernels_end_to_end(spark):
    """REAL pixels through Spark: PNG payloads (pure numpy+zlib codec)
    probe and resize natively — no PIL, no fake metadata."""
    import numpy as np

    from erigon_extract_spark.functions.png import decode_png, encode_png
    from erigon_extract_spark.operators.multimodal import (
        extract_media_metadata,
        resize_images,
    )

    rng = np.random.default_rng(17)
    imgs = {
        1: rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8),
        2: rng.integers(0, 256, size=(100, 30, 4), dtype=np.uint8),
    }
    media = spark.createDataFrame(
        [(i, "image/png", bytearray(encode_png(a))) for i, a in imgs.items()],
        "doc_id long, mime string, payload binary",
    )
    meta = {r.doc_id: r for r in extract_media_metadata(
        media, fake_decode=False
    ).collect()}
    assert (meta[1].width, meta[1].height) == (64, 48)
    assert (meta[2].width, meta[2].height) == (30, 100)
    out = {r.doc_id: r for r in resize_images(
        media, 16, 12, fake_decode=False
    ).collect()}
    for i, src in imgs.items():
        resized = decode_png(bytes(out[i].payload))
        assert resized.shape == (12, 16, src.shape[2])
        # real interpolation: the resized image of a random source is not
        # constant, and a constant source resizes to the same constant
    const = np.full((40, 40, 3), 123, dtype=np.uint8)
    cmedia = spark.createDataFrame(
        [(9, "image/png", bytearray(encode_png(const)))],
        "doc_id long, mime string, payload binary",
    )
    (crow,) = resize_images(cmedia, 8, 8, fake_decode=False).collect()
    assert np.all(decode_png(bytes(crow.payload)) == 123)


def test_wav_real_audio_kernel_end_to_end(spark):
    """REAL waveforms through Spark: WAV payloads (pure numpy RIFF/PCM
    parser) probe and feature-extract natively — no audio library."""
    import numpy as np

    from erigon_extract_spark.functions.wav import encode_wav
    from erigon_extract_spark.operators.multimodal import (
        extract_audio_features,
        extract_media_metadata,
    )

    rate = 8000
    t = np.arange(rate)  # 1 second
    sine = (np.sin(2 * np.pi * 440 * t / rate) * 20000).astype(np.int16)
    silence = np.zeros(rate // 2, dtype=np.int16)
    stereo = np.stack([sine, -sine], axis=1)
    media = spark.createDataFrame(
        [
            (1, "audio/wav", bytearray(encode_wav(sine, rate))),
            (2, "audio/wav", bytearray(encode_wav(silence, rate))),
            (3, "audio/wav", bytearray(encode_wav(stereo, rate))),
            (4, "audio/wav", b"not a wav"),
            (5, "audio/wav", None),
        ],
        "doc_id long, mime string, payload binary",
    )
    out = {r.doc_id: r for r in extract_audio_features(media).collect()}
    assert out[1].sample_rate == rate and out[1].duration_ms == 1000
    # 440 Hz sine: ~880 zero crossings/s; RMS of a sine = peak/sqrt(2)
    assert abs(out[1].zcr_per_s - 880) < 10
    assert abs(out[1].rms - out[1].peak / 2**0.5) < 0.01
    assert not out[1].silent
    assert out[2].silent and out[2].rms == 0.0
    assert out[3].n_channels == 2
    # stereo mix of (x, -x) is digital silence — the mono-mix contract
    assert out[3].silent
    assert out[4].decode_error and "WavFormatError" in out[4].decode_error
    assert out[5].decode_error == "null payload"
    # the generic probe routes RIFF to the native WAV path: real duration
    meta = {r.doc_id: r for r in extract_media_metadata(
        media.filter("doc_id = 1"), fake_decode=False
    ).collect()}
    assert meta[1].duration_ms == 1000 and meta[1].width is None


def test_lsh_recall_report_scurve(spark, sf_dir):
    """The banding s-curve: recall is non-decreasing in the threshold,
    hits 1.0 on near-duplicates (planted: a doc and its 90%-overlap
    mutation), and candidate hits never exceed true pairs."""
    from pyspark.sql import functions as F

    from erigon_extract_spark.operators.dedup import lsh_recall_report

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # plant near-duplicates: copy every 10th doc with one word appended
    # (jaccard over 5-gram shingles stays very high)
    dups = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" trailer")).alias("text"),
    )
    rep = {
        float(r.threshold): r
        for r in lsh_recall_report(docs.unionByName(dups)).collect()
    }
    assert rep, "no thresholds produced rows"
    ts = sorted(rep)
    recalls = [rep[t].recall for t in ts]
    assert recalls == sorted(recalls), recalls  # s-curve: non-decreasing
    for t in ts:
        assert 0.0 <= rep[t].recall <= 1.0
        assert rep[t].n_hit <= rep[t].n_true
    # the planted near-dups sit far above the 4x4 band breakpoint
    assert rep[ts[-1]].recall == 1.0, rep[ts[-1]]


def test_ngram_jaccard_construction_no_driver_collect(spark, monkeypatch):
    """Building the jaccard-pairs plan must not run a driver-side
    ``collect()``/``toPandas()`` (ADVICE r11 medium: the dense-encode's
    construction-time collect made every plan CONSTRUCTION — the bench
    runs one per timed repeat, and five query builders call this
    function — eagerly execute the full explode+freq pipeline,
    regressing dedup_connected_clusters sf1 36.5 s -> 121.7 s at
    local[32]). Constructions may still plan lazy checkpoints; they may
    not pull rows to the driver."""
    from pyspark.sql import DataFrame
    from erigon_extract_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i}") for i in range(20)],
        "`doc_id` BIGINT, `text` STRING",
    )

    def _no_collect(self, *a, **k):  # pragma: no cover - fails the test
        raise AssertionError("driver collect() during plan construction")

    monkeypatch.setattr(DataFrame, "collect", _no_collect)
    monkeypatch.setattr(DataFrame, "toPandas", _no_collect)
    pairs = ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.2)
    _ = pairs.columns  # forces analysis; still no driver pull
    monkeypatch.undo()
    # and the plan still computes: smoke the action once
    assert pairs.count() >= 0
