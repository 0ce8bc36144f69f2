"""BPE training/encoding vs a pure-python reference implementation."""

from __future__ import annotations

from collections import Counter


def _ref_train(corpus_words: Counter, n_merges: int):
    """Reference BPE: same conventions as operators/bpe.py (word-internal,
    no end marker, ties lexicographic)."""
    vocab = {w: list(w) for w in corpus_words}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, cnt in corpus_words.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w in vocab:
            syms, out, i = vocab[w], [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


CORPUS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest new low",
    "lowest newest widest lower",
]


def test_train_bpe_matches_reference_merge_sequence(spark):
    from erigon_extract_spark.operators.bpe import train_bpe

    docs = spark.createDataFrame(
        list(enumerate(CORPUS)), "doc_id long, text string"
    )
    words = Counter(w for line in CORPUS for w in line.split())
    ref_merges, _ = _ref_train(words, 12)
    got = train_bpe(docs, n_merges=12, checkpoint_every=4)
    assert got == ref_merges, (got, ref_merges)


def test_encode_bpe_matches_reference_tokenization(spark):
    from erigon_extract_spark.operators.bpe import encode_bpe, train_bpe

    docs = spark.createDataFrame(
        list(enumerate(CORPUS)), "doc_id long, text string"
    )
    words = Counter(w for line in CORPUS for w in line.split())
    merges = train_bpe(docs, n_merges=10, checkpoint_every=3)
    _, ref_vocab = _ref_train(words, 10)
    enc = encode_bpe(docs, merges).collect()
    for r in enc:
        assert r.n_word_tokens == len(ref_vocab[r.word]), (
            r.word, r.n_word_tokens, ref_vocab[r.word]
        )
    # merged tokens shorten words: "low" (freq 5 + prefixes) must compress
    low_rows = [r for r in enc if r.word == "low"]
    assert low_rows and all(r.n_word_tokens == 1 for r in low_rows)


def test_greedy_leftmost_merge_on_repeats(spark):
    """'aaa' under merge (a,a): leftmost-first, merged token does not
    re-merge in the same round -> ['aa', 'a']."""
    from pyspark.sql import functions as F

    from erigon_extract_spark.operators.bpe import _apply_merge

    df = spark.createDataFrame([(["a", "a", "a"],)], "syms array<string>")
    out = df.select(_apply_merge(F.col("syms"), "a", "a").alias("m")).first()
    assert out.m == ["aa", "a"]


def _ref_train_batched(corpus_words: Counter, n_merges: int, m: int):
    """Python mirror of train_bpe's batched mode: per round, rank pairs by
    (-freq, pair), consider only the top 4m (matching the Spark side's
    over-fetch limit), greedily keep symbol-disjoint pairs (merged output
    counts as used), apply all, re-count."""
    vocab = {w: list(w) for w in corpus_words}

    def apply(best):
        a, b = best
        for w in vocab:
            syms, out, i = vocab[w], [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out

    merges = []
    while len(merges) < n_merges:
        want = min(m, n_merges - len(merges))
        pairs = Counter()
        for w, cnt in corpus_words.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += cnt
        if not pairs:
            break
        ranked = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        used, batch = set(), []
        for (a, b), _freq in ranked[: 4 * want]:
            if len(batch) == want:
                break
            if a in used or b in used:
                continue
            batch.append((a, b))
            used.update((a, b, a + b))
        for p in batch:
            merges.append(p)
            apply(p)
    return merges, vocab


def test_train_bpe_batched_matches_batched_reference(spark):
    """batch_merges=8 must implement EXACTLY the documented batched rule
    (differential vs the python mirror), and batch_merges=1 must remain
    the exact sequential path."""
    from erigon_extract_spark.operators.bpe import train_bpe

    docs = spark.createDataFrame(
        list(enumerate(CORPUS)), "doc_id long, text string"
    )
    words = Counter(w for line in CORPUS for w in line.split())

    ref8, _ = _ref_train_batched(words, 12, 8)
    got8 = train_bpe(docs, n_merges=12, checkpoint_every=4, batch_merges=8)
    assert got8 == ref8, (got8, ref8)

    ref_seq, _ = _ref_train(words, 12)
    got1 = train_bpe(docs, n_merges=12, checkpoint_every=4, batch_merges=1)
    assert got1 == ref_seq
