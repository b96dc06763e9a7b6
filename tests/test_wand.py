"""Block-max WAND == brute-force top-k (property, SURVEY.md §5.2)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_spark.operators import codec
from searchengine_spark.operators.segments import _wand_shard


def brute_force(term_postings, idfs, avgdl, k):
    scores: dict[int, list[tuple[str, float]]] = {}
    for term, posts in term_postings.items():
        for doc_id, tf, dl in posts:
            c = codec.bm25_contrib(np.array([tf]), np.array([dl]), idfs[term], avgdl)[0]
            scores.setdefault(doc_id, []).append((term, float(c)))
    out = []
    for doc_id, contribs in scores.items():
        contribs.sort()
        s = 0.0
        for _, c in contribs:
            s += c
        out.append((s, doc_id))
    out.sort(key=lambda t: (-t[0], t[1]))
    return out[:k]


@given(
    st.dictionaries(
        st.sampled_from(["alpha", "beta", "gamma", "delta"]),
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3000),
                st.integers(min_value=1, max_value=30),
                st.integers(min_value=5, max_value=500),
            ),
            min_size=1,
            max_size=300,
            unique_by=lambda t: t[0],
        ),
        min_size=1,
        max_size=4,
    ),
    st.integers(min_value=1, max_value=12),
)
@settings(max_examples=80, deadline=None)
def test_wand_equals_bruteforce(term_postings, k):
    idfs = {"alpha": 2.3, "beta": 0.7, "gamma": 4.1, "delta": 1.0}
    avgdl = 80.0
    term_blocks = {}
    for term, posts in term_postings.items():
        posts = sorted(posts)
        ids = np.array([p[0] for p in posts], dtype=np.uint64)
        tfs = np.array([p[1] for p in posts], dtype=np.uint64)
        dls = np.array([p[2] for p in posts], dtype=np.uint64)
        blocks = codec.encode_blocks(
            ids, tfs, dls, [[] for _ in posts], idf=idfs[term], avgdl=avgdl, block_size=16
        )
        for i, b in enumerate(blocks):
            b["bucket"] = 0
            b["shard"] = 0
            b["term"] = term
        term_blocks[term] = blocks

    got = _wand_shard(term_blocks, idfs, avgdl, k)
    want = brute_force(term_postings, idfs, avgdl, k)
    assert [(d, round(s, 9)) for s, d, _ in got] == [(d, round(s, 9)) for s, d in want]
    # scores bit-identical (same deterministic term-sorted summation)
    assert [s for s, _, _ in got] == [s for s, _ in want]


@given(
    st.dictionaries(
        st.sampled_from(["alpha", "beta", "gamma", "delta"]),
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3000),
                st.integers(min_value=1, max_value=30),
                st.integers(min_value=5, max_value=500),
            ),
            min_size=1,
            max_size=300,
            unique_by=lambda t: t[0],
        ),
        min_size=1,
        max_size=4,
    ),
    st.integers(min_value=1, max_value=12),
)
@settings(max_examples=80, deadline=None)
def test_maxscore_equals_wand_and_bruteforce(term_postings, k):
    """MaxScore == WAND == brute force, in both float and micros modes —
    the two dynamic-pruning executors are interchangeable."""
    from searchengine_spark.operators.segments import _maxscore_shard

    idfs = {"alpha": 2.3, "beta": 0.7, "gamma": 4.1, "delta": 1.0}
    avgdl = 80.0
    term_blocks = {}
    for term, posts in term_postings.items():
        posts = sorted(posts)
        ids = np.array([p[0] for p in posts], dtype=np.uint64)
        tfs = np.array([p[1] for p in posts], dtype=np.uint64)
        dls = np.array([p[2] for p in posts], dtype=np.uint64)
        blocks = codec.encode_blocks(
            ids, tfs, dls, [[] for _ in posts], idf=idfs[term], avgdl=avgdl, block_size=16
        )
        for b in blocks:
            b["bucket"] = 0
            b["shard"] = 0
            b["term"] = term
        term_blocks[term] = blocks

    got = _maxscore_shard(term_blocks, idfs, avgdl, k)
    want = brute_force(term_postings, idfs, avgdl, k)
    assert [(d, s) for s, d, _ in got] == [(d, s) for s, d in want]
    # micros mode agrees with WAND micros mode (fresh blocks — iterators
    # mutate state, so each executor needs its own decode cursors)
    def fresh():
        tb = {}
        for term, posts in term_postings.items():
            posts = sorted(posts)
            ids = np.array([p[0] for p in posts], dtype=np.uint64)
            tfs = np.array([p[1] for p in posts], dtype=np.uint64)
            dls = np.array([p[2] for p in posts], dtype=np.uint64)
            blocks = codec.encode_blocks(
                ids, tfs, dls, [[] for _ in posts], idf=idfs[term], avgdl=avgdl,
                block_size=16,
            )
            for b in blocks:
                b["bucket"] = 0; b["shard"] = 0; b["term"] = term
            tb[term] = blocks
        return tb

    ms = _maxscore_shard(fresh(), idfs, avgdl, k, micros=True)
    wd = _wand_shard(fresh(), idfs, avgdl, k, micros=True)
    assert [(d, s) for s, d, _ in ms] == [(d, s) for s, d, _ in wd]


def test_phrase_micros_equals_columnar(spark):
    """The segments-served scored phrase (positions decoded from blobs)
    must equal the columnar phrase_topk row-for-row in exact micros."""
    from searchengine_spark.operators import serve
    from searchengine_spark.plans.gate_index import gate_index

    idx = gate_index(spark, "/root/testdata/sf0.001")
    cols = serve.phrase_topk(spark, idx, ["hash", "join"], k=10).collect()
    wand = serve.phrase_topk_wand(spark, idx, ["hash", "join"], k=10).collect()
    assert [tuple(r) for r in cols] == [tuple(r) for r in wand] and cols
    # absent term -> unmatchable phrase, empty on both paths
    assert serve.phrase_topk_wand(spark, idx, ["hash", "zzznope"], k=10).count() == 0


def test_phrase_freq_consistent_with_phrase_match(spark):
    """phrase_freq_topk's doc set == phrase_match's (same adjacency), and
    every phrase_freq >= 1; score is monotone in pf for equal dl."""
    from searchengine_spark.operators import serve
    from searchengine_spark.plans.gate_index import gate_index

    idx = gate_index(spark, "/root/testdata/sf0.001")
    phrase = ["hash", "join"]
    match_ids = {r["doc_id"] for r in serve.phrase_match(spark, idx, phrase).collect()}
    scored = serve.phrase_freq_topk(spark, idx, phrase, k=10_000).collect()
    assert {r["doc_id"] for r in scored} == match_ids
    assert all(r["phrase_freq"] >= 1 for r in scored)


def test_span_first_topk_bounds(spark):
    """Every result's first occurrence is inside the window, and the doc
    set equals the brute positions check at gate scale."""
    from pyspark.sql import functions as F

    from searchengine_spark.operators import serve
    from searchengine_spark.plans.gate_index import gate_index

    idx = gate_index(spark, "/root/testdata/sf0.001")
    out = serve.span_first_topk(spark, idx, "spark", k=10_000, max_pos=8).collect()
    assert all(0 <= r["first_pos"] < 8 for r in out)
    brute = (
        idx["postings"]
        .filter(F.col("term") == "spark")
        .select("doc_id", F.element_at("positions", 1).alias("fp"))
        .filter(F.col("fp") < 8)
        .count()
    )
    assert len(out) == brute


@given(
    st.dictionaries(
        st.sampled_from(["alpha", "beta", "gamma", "delta"]),
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3000),
                st.integers(min_value=1, max_value=30),
                st.integers(min_value=5, max_value=500),
            ),
            min_size=1,
            max_size=300,
            unique_by=lambda t: t[0],
        ),
        min_size=1,
        max_size=4,
    ),
    st.integers(min_value=1, max_value=12),
)
@settings(max_examples=80, deadline=None)
def test_blockmax_and_seg_exhaustive_equal_wand(term_postings, k):
    """The two vectorized executors (interval-sweep block-max, decode-all
    exhaustive) return exactly what doc-at-a-time WAND returns, in micros
    mode — all four segment-served scorers are interchangeable."""
    from searchengine_spark.operators.segments import (
        _blockmax_seg_shard,
        _exhaustive_seg_shard,
    )

    idfs = {"alpha": 2.3, "beta": 0.7, "gamma": 4.1, "delta": 1.0}
    avgdl = 80.0

    def fresh(block_size):
        term_blocks = {}
        for term, posts in term_postings.items():
            posts = sorted(posts)
            ids = np.array([p[0] for p in posts], dtype=np.uint64)
            tfs = np.array([p[1] for p in posts], dtype=np.uint64)
            dls = np.array([p[2] for p in posts], dtype=np.uint64)
            blocks = codec.encode_blocks(
                ids, tfs, dls, [[] for _ in posts], idf=idfs[term], avgdl=avgdl,
                block_size=block_size,
            )
            for b in blocks:
                b["bucket"] = 0
                b["shard"] = 0
                b["term"] = term
            term_blocks[term] = blocks
        return term_blocks

    # block_size=16 → ≤19 blocks/term (all-eager path); block_size=2 →
    # up to 150 blocks (block-level coverage + mixed eager/block path)
    for bs in (16, 2):
        wd = _wand_shard(fresh(bs), idfs, avgdl, k, micros=True)
        bm = _blockmax_seg_shard(fresh(bs), idfs, avgdl, k, micros=True)
        ex = _exhaustive_seg_shard(fresh(bs), idfs, avgdl, k, micros=True)
        assert [(s, d) for s, d, _ in bm] == [(s, d) for s, d, _ in wd], bs
        assert [(s, d) for s, d, _ in ex] == [(s, d) for s, d, _ in wd], bs
