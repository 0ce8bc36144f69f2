"""Property-based checks (hypothesis) for the r3 operators: sessionize,
sequence packing, and repetition ratio are each compared against a
brute-force pure-Python oracle on randomized inputs — the same strategy
the codec suite uses for round-trips."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from erigon_extract_spark.operators.packing import pack_sequences
from erigon_extract_spark.operators.windows import sessionize


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user_id
        st.integers(min_value=0, max_value=10_000_000),  # tick seconds
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=15, deadline=None)
@given(events_strategy)
def test_sessionize_matches_bruteforce(spark, evs):
    gap = 3600
    rows = [(u, i, t * 1_000_000) for i, (u, t) in enumerate(evs)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, tick long")
    got = {
        (r["user_id"], r["event_id"]): r["session_id"]
        for r in sessionize(
            df, ["user_id"], "tick", gap, tiebreak_cols=["event_id"]
        ).collect()
    }
    # brute force: per user, walk events by (tick, event_id)
    want = {}
    by_user: dict[int, list[tuple[int, int]]] = {}
    for u, eid, t in rows:
        by_user.setdefault(u, []).append((t, eid))
    for u, lst in by_user.items():
        lst.sort()
        sid, last = 0, None
        for t, eid in lst:
            if last is None or t - last > gap * 1_000_000:
                sid += 1
            last = t
            want[(u, eid)] = sid
    assert got == want


docs_strategy = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=30),
    min_size=1,
    max_size=25,
)


@settings(max_examples=10, deadline=None)
@given(docs_strategy)
def test_pack_sequences_matches_bruteforce(spark, texts):
    budget, shards = 7, 3
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["chunk_id"], r["chunk_offset"])
        for r in pack_sequences(
            df, context_tokens=budget, n_shards=shards
        ).collect()
    }
    cums: dict[int, int] = {}
    for i, t in rows:  # ids ascending == shard order
        toks = len(t.split()) if t.strip() else 0
        shard = i % shards
        cum = cums.get(shard, 0)
        assert got[i] == (toks, cum // budget, cum % budget), (i, t)
        cums[shard] = cum + toks
