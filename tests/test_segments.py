"""Segment path end-to-end: WAND over compressed segments must equal the
uncompressed BM25 join path (and hence the oracle) bit-for-bit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.query import search_bm25
from searchengine_spark.operators.segments import wand_topk
from searchengine_spark.functions.textproc import query_tokenize
from searchengine_spark.plans.build_index import build_index, load_index
from searchengine_spark.sources.corpus import generate_corpus

N_DOCS = 200

QUERIES = ["spark", "index search engine", "return import def", "tested testing meetings"]


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    corpus = generate_corpus(spark, N_DOCS, seed=42, n_partitions=8)
    index_dir = str(tmp_path_factory.mktemp("segidx"))
    build_index(spark, corpus, index_dir)
    return load_index(spark, index_dir)


def _avgdl(index) -> float:
    stats = index["documents"].agg(F.sum("doc_len").alias("s"), F.count(F.lit(1)).alias("c")).collect()[0]
    return float(stats["s"]) / float(stats["c"])


@pytest.mark.parametrize("query", QUERIES)
def test_wand_equals_join_path(spark, index, query):
    terms = query_tokenize(query)
    got = wand_topk(
        spark, index["segments"], index["lexicon"], index["documents"], terms, _avgdl(index), k=10
    ).collect()
    want = search_bm25(
        spark, index["postings"], index["lexicon"], index["documents"], query, k=10
    ).collect()
    assert [(r["rank"], r["doc_id"], r["score"]) for r in got] == [
        (r["rank"], r["doc_id"], r["score"]) for r in want
    ]
    assert [r["url"] for r in got] == [r["url"] for r in want]


def test_segment_compression_ratio(index):
    """Compressed segments must actually compress: binary blobs smaller than
    raw 8-byte-per-posting encoding."""
    seg = index["segments"]
    row = seg.agg(
        F.sum(F.length("doc_ids_delta_varint")).alias("b"),
        F.sum("n_postings").alias("n"),
    ).collect()[0]
    assert row["b"] < 8 * row["n"]


def test_merge_associativity(spark, index, tmp_path_factory):
    """Union of partition-local segment merges == single-shot build: encoding
    the same postings in two halves then merging yields identical decoded
    postings (SURVEY.md §5.2)."""
    from searchengine_spark.operators.segments import encode_segments, merge_segments
    from searchengine_spark.operators import codec

    post = index["postings"]
    lex = index["lexicon"]
    avgdl = _avgdl(index)
    half_a = post.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    half_b = post.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1)
    merged = merge_segments(
        encode_segments(half_a, lex, avgdl), encode_segments(half_b, lex, avgdl)
    )
    single = encode_segments(post, lex, avgdl)

    def decode_all(df):
        out = {}
        for row in df.collect():
            b = row.asDict()
            ids, tfs, dls = codec.decode_block(b)
            key = (b["shard"], b["term"])
            cur = out.setdefault(key, [])
            cur += list(zip(ids.tolist(), tfs.tolist(), dls.tolist()))
        return {k: sorted(v) for k, v in out.items()}

    assert decode_all(merged) == decode_all(single)


@pytest.mark.parametrize(
    "query",
    [
        '"index build"',  # both terms survive index tokenization → matches
        # "inverted" crude-stems to "inver" at index time but Porter-stems to
        # "invert" at query time (quirk Q2) → exact phrase unmatchable even
        # though the raw text contains it — both paths must agree on empty
        '"inverted index build"',
    ],
)
def test_wand_phrase_equals_join_path(spark, index, query):
    """Phrase mode served from compressed segments == positional phrase over
    raw postings (same docs, bit-identical scores)."""
    phrase_terms = query_tokenize(query[1:-1])
    got = wand_topk(
        spark, index["segments"], index["lexicon"], index["documents"],
        phrase_terms, _avgdl(index), k=10, phrase=True,
    ).collect()
    want = search_bm25(
        spark, index["postings"], index["lexicon"], index["documents"], query, k=10,
        positional_phrase=True,
    ).collect()
    assert [(r["rank"], r["doc_id"], r["score"]) for r in got] == [
        (r["rank"], r["doc_id"], r["score"]) for r in want
    ]


def test_wand_phrase_repeated_term(spark, index):
    """Repeated-term phrase must use the FULL term sequence for adjacency —
    dedup-before-adjacency would match the shortened phrase (review finding)."""
    from searchengine_spark.operators.segments import _phrase_topk_in_shard
    import numpy as np
    from searchengine_spark.operators import codec

    # craft one shard: doc 1 has "spark spark", doc 2 only "spark data spark"
    def blocks_for(postings):  # {doc: positions}
        ids = np.array(sorted(postings), dtype=np.uint64)
        tfs = np.array([len(postings[d]) for d in sorted(postings)], dtype=np.uint64)
        dls = np.array([10] * len(ids), dtype=np.uint64)
        pos = [postings[d] for d in sorted(postings)]
        bl = codec.encode_blocks(ids, tfs, dls, pos, idf=1.0, avgdl=10.0)
        for b in bl:
            b["term"] = "spark"
        return bl

    term_blocks = {"spark": blocks_for({1: [0, 1], 2: [0, 2]})}
    got = _phrase_topk_in_shard(term_blocks, ["spark", "spark"], {"spark": 1.0}, 10.0, 10)
    assert [d for _, d in got] == [1]  # only doc 1 has adjacent repeat

    # and via the public API on the real index: "index index" (never adjacent)
    got2 = wand_topk(
        spark, index["segments"], index["lexicon"], index["documents"],
        ["index", "index"], _avgdl(index), k=5, phrase=True,
    ).collect()
    want2 = search_bm25(
        spark, index["postings"], index["lexicon"], index["documents"],
        '"index index"', k=5, positional_phrase=True,
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in got2] == [(r["doc_id"], r["score"]) for r in want2]


def test_compaction_plan_policy():
    """Size-tiered planner: same-tier generations group oldest-first, tiers
    with one member stay untouched, groups cap at max_merge."""
    from searchengine_spark.operators.segments import plan_compaction

    sizes = {"g0": 100, "g1": 120, "g2": 110, "g3": 5000, "g4": 90, "g5": 130}
    plan = plan_compaction(sizes, tier_ratio=4.0, min_merge=2, max_merge=4)
    flat = [n for g in plan for n in g]
    assert "g3" in sizes and "g3" not in flat  # lone big tier untouched
    assert all(len(g) >= 2 for g in plan)
    assert flat == sorted(flat)  # oldest-first, deterministic
    assert max(len(g) for g in plan) <= 4


def test_compaction_preserves_postings(spark):
    """Compacting four single-quarter generations must decode to exactly
    the postings of a single-shot build (the merge-associativity property,
    exercised through the planner + executor)."""
    from pyspark.sql import functions as F

    from searchengine_spark.operators.segments import (
        _segments_from_docs,
        compact_generations,
        decode_postings,
        plan_compaction,
    )
    from searchengine_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    gens = {
        f"g{q}": _segments_from_docs(
            docs.filter(F.pmod(F.col("doc_id"), F.lit(4)) == q), shard_span=64
        )
        for q in range(4)
    }
    plan = plan_compaction({name: 1000 for name in gens})  # same tier -> one group
    assert plan == [[f"g{q}" for q in range(4)]]
    compacted = compact_generations(gens, plan)
    assert len(compacted) == 1
    got = {
        (r.term, r.doc_id, r.tf)
        for r in decode_postings(next(iter(compacted.values()))).collect()
    }
    want = {
        (r.term, r.doc_id, r.tf)
        for r in decode_postings(_segments_from_docs(docs, shard_span=64)).collect()
    }
    assert got == want
