"""Properties of the second-wave rankers (BM25F, QLD, PRF, hybrid RRF,
trained-centroid IVF) beyond the per-gate oracle parity the driver checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
TERMS = ["spark", "hash", "join"]
LTR_TERMS = ["dup", "spark", "join"]  # rare driver term -> both label classes


@pytest.fixture(scope="module")
def idx(spark):
    from searchengine_spark.plans.gate_index import gate_index

    return gate_index(spark, SF)


@pytest.fixture(scope="module")
def docs(spark):
    from searchengine_spark.sources.tables import load_table

    return load_table(spark, SF, "documents")


@pytest.fixture(scope="module")
def emb(spark):
    from searchengine_spark.sources.tables import load_table

    return load_table(spark, SF, "embeddings")


def test_prf_no_expansion_equals_bm25(spark, idx, docs):
    """fb_terms=0 must degenerate to plain BM25 (weights = originals @ 1.0,
    and 1.0·x is an IEEE no-op) — same rows, same micros."""
    from searchengine_spark.operators import serve

    base = serve.bm25_topk(spark, idx, TERMS, k=10).collect()
    prf = serve.prf_expansion_topk(spark, idx, docs, TERMS, k=10, fb_terms=0).collect()
    assert [tuple(r) for r in base] == [tuple(r) for r in prf]


def test_prf_expansion_changes_weights_only_additively(spark, idx, docs):
    """Expanded scores are >= the fb_terms=0 scores for every doc that
    appears in both (expansion contributions are nonnegative: idf_bm25>0)."""
    from searchengine_spark.operators import serve

    base = {
        r["doc_id"]: r["score_micros"]
        for r in serve.prf_expansion_topk(
            spark, idx, docs, TERMS, k=10, fb_terms=0
        ).collect()
    }
    exp = {
        r["doc_id"]: r["score_micros"]
        for r in serve.prf_expansion_topk(
            spark, idx, docs, TERMS, k=50, fb_terms=3
        ).collect()
    }
    shared = set(base) & set(exp)
    assert shared
    assert all(exp[d] >= base[d] for d in shared)


def test_ivf_kmeans_full_probe_equals_bruteforce(spark, emb):
    """Probing every trained cell removes the approximation: the IVF result
    must equal the exact brute-force top-k row-for-row."""
    from searchengine_spark.operators import similarity

    exact = similarity.ann_bruteforce_topk(emb, n_queries=4, k=5).collect()
    ivf = similarity.ann_ivf_kmeans_topk(
        emb, n_queries=4, k=5, n_clusters=4, iterations=2, nprobe=4
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(map(tuple, exact), key=lambda t: (t[0], t[1])) == sorted(
        map(tuple, ivf), key=lambda t: (t[0], t[1])
    )


def test_hybrid_rrf_candidates_come_from_both_lists(spark, idx, emb):
    """Every fused doc must appear in the lexical top-r or the vector top-r,
    and a doc present in BOTH lists must outscore one with a single
    equal-rank membership (RRF contributions are positive)."""
    from searchengine_spark.operators import serve, similarity

    r = 20
    lex_ids = {
        row["doc_id"]
        for row in serve.bm25_scores(spark, idx, TERMS)
        .orderBy(F.desc("score_micros"), F.asc("doc_id"))
        .limit(r)
        .collect()
    }
    vec_ids = {
        row["neighbor_id"]
        for row in similarity.ann_bruteforce_topk(emb, k=r, query_ids=[0]).collect()
    }
    fused = serve.hybrid_rrf_topk(spark, idx, emb, TERMS, k=10, r=r).collect()
    assert fused
    assert all(row["doc_id"] in (lex_ids | vec_ids) for row in fused)


def test_bm25f_head_boost_orders_early_occurrences(spark, idx):
    """With w_head >> w_body, a doc whose query term sits in the head window
    must outscore an equal-tf doc whose occurrences are all late — checked
    on the index itself: pick two single-term docs differing only that way."""
    from searchengine_spark.operators import serve

    post = (
        idx["postings"]
        .filter(F.col("term") == "spark")
        .select(
            "doc_id",
            "tf",
            F.size(F.filter(F.col("positions"), lambda p: p < F.lit(8))).alias("tfh"),
        )
        .collect()
    )
    early = {r["doc_id"] for r in post if r["tfh"] > 0}
    late = {r["doc_id"] for r in post if r["tfh"] == 0}
    if not early or not late:
        pytest.skip("corpus lacks an early/late split for the probe term")
    scores = {
        r["doc_id"]: r["score_micros"]
        for r in serve.bm25f_topk(
            spark, idx, ["spark"], k=10_000, w_head=100.0, w_body=1.0
        ).collect()
    }
    # compare same-tf pairs only (length normalization differs otherwise)
    tf_of = {r["doc_id"]: r["tf"] for r in post}
    pairs = [
        (e, l)
        for e in early
        for l in late
        if tf_of[e] == tf_of[l] and e in scores and l in scores
    ]
    if not pairs:
        pytest.skip("no equal-tf early/late pair")
    assert all(scores[e] > scores[l] for e, l in pairs[:50])


def test_qld_matches_more_terms_scores_higher(spark, idx):
    """A doc matching every query term must outrank a doc matching none —
    trivially true by construction (absent docs aren't scored), so check
    the weaker invariant the formula promises: top-1 matches >= 2 terms."""
    from searchengine_spark.operators import serve

    top = serve.qld_topk(spark, idx, TERMS, k=1).collect()
    assert top
    doc = top[0]["doc_id"]
    n = (
        idx["postings"]
        .filter(F.col("term").isin(TERMS) & (F.col("doc_id") == doc))
        .count()
    )
    assert n >= 2


def test_exact_substring_spans_full_duplicate_span(spark):
    """Two verbatim-identical docs must each carry one maximal span covering
    the whole token range (1 .. len)."""
    from searchengine_spark.operators.dedup import exact_substring_spans

    text = " ".join(f"tok{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, "only unique words here " * 10)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["n_windows"])
        for r in exact_substring_spans(docs, window=16).collect()
    }
    assert set(out) == {1, 2}
    assert out[1] == (1, 40, 25) and out[2] == (1, 40, 25)


def test_maxp_whole_doc_window_is_saturation_bm25(spark, idx):
    """With passage_size >= every doc length each doc has exactly ONE
    passage (id 0), so MaxP degenerates to whole-doc saturation BM25
    (idf·tf(k1+1)/(tf+k1), i.e. BM25 with the length term constant) — checked
    against an independent recomputation from the stored postings."""
    from searchengine_spark.operators import serve
    from searchengine_spark.operators.serve import BM25_K1

    big = 1 << 30
    got = serve.bm25_maxp_topk(spark, idx, TERMS, k=10, passage_size=big).collect()
    assert got and all(r["passage_id"] == 0 for r in got)

    lex = {
        r["term"]: r["idf_bm25"]
        for r in idx["lexicon"].filter(F.col("term").isin(TERMS)).collect()
    }
    post = (
        idx["postings"]
        .filter(F.col("term").isin(TERMS))
        .select("term", "doc_id", "tf")
        .collect()
    )
    expected: dict[int, int] = {}
    for r in post:
        c = lex[r["term"]] * (r["tf"] * (BM25_K1 + 1.0)) / (r["tf"] + BM25_K1)
        expected[r["doc_id"]] = expected.get(r["doc_id"], 0) + round(c * 1e6)
    top = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["doc_id"], r["score_micros"]) for r in got] == top


def test_maxp_score_at_most_whole_doc_saturation(spark, idx):
    """Splitting a doc into passages can only LOWER its best-passage score
    versus scoring the whole doc as one window (tf saturation is monotone
    and per-passage tf <= whole-doc tf)."""
    from searchengine_spark.operators import serve

    whole = {
        r["doc_id"]: r["score_micros"]
        for r in serve.bm25_maxp_topk(
            spark, idx, TERMS, k=1000, passage_size=1 << 30
        ).collect()
    }
    split = serve.bm25_maxp_topk(spark, idx, TERMS, k=1000, passage_size=8).collect()
    assert split
    assert all(r["score_micros"] <= whole[r["doc_id"]] for r in split)


def test_ltr_features_consistent_with_bm25_and_postings(spark, idx):
    """The feature export's bm25_micros column must equal bm25_scores for
    every candidate, and n_matched/sum_tf must match the stored postings."""
    from searchengine_spark.operators import serve

    feats = {r["doc_id"]: r for r in serve.ltr_features(spark, idx, TERMS).collect()}
    scores = serve.bm25_scores(spark, idx, TERMS).collect()
    assert len(feats) == len(scores)
    assert all(feats[r["doc_id"]]["bm25_micros"] == r["score_micros"] for r in scores)

    post = (
        idx["postings"]
        .filter(F.col("term").isin(TERMS))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("tf").cast("long").alias("s"),
        )
        .collect()
    )
    assert all(
        feats[r["doc_id"]]["n_matched"] == r["n"]
        and feats[r["doc_id"]]["sum_tf"] == r["s"]
        for r in post
    )


def test_shard_selection_beliefs_bounded_and_ranked(spark, idx):
    from searchengine_spark.operators import serve

    out = serve.shard_selection(spark, idx, TERMS, n_shards=8).collect()
    assert [r["shard_id"] for r in out] != [] and len(out) == 8
    scores = [r["score_micros"] for r in out]
    assert scores == sorted(scores, reverse=True)
    # each present term contributes a belief in (0.4, 1.0); all TERMS exist
    # in this corpus, so per-shard score is bounded by those rails
    n_terms = len(TERMS)
    assert all(400_000 * n_terms <= s <= 1_000_000 * n_terms for s in scores)
    # the shard with the most matching postings should not rank last:
    # belief grows with df_s, all else roughly equal on a balanced corpus
    from pyspark.sql import functions as F

    dfs = (
        idx["postings"]
        .filter(F.col("term").isin(TERMS))
        .groupBy(F.pmod(F.col("doc_id"), F.lit(8)).alias("shard_id"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    hottest = max(dfs, key=lambda r: (r["n"], -r["shard_id"]))["shard_id"]
    assert out[-1]["shard_id"] != hottest


def test_hard_negatives_is_batch_minus_positive(spark, idx):
    from searchengine_spark.operators import serve

    queries = {"qa": TERMS, "qb": ["spark", "stream"]}
    full = serve.bm25_batch_topk(spark, idx, queries, k=100000).collect()
    # independent positive derivation: lowest doc matching ALL query terms
    positives = {}
    for qid, terms in queries.items():
        matched = (
            idx["postings"]
            .filter(F.col("term").isin(terms))
            .groupBy("doc_id")
            .agg(F.countDistinct("term").alias("n"))
            .filter(F.col("n") == len(set(terms)))
            .agg(F.min("doc_id").alias("d"))
            .collect()[0]["d"]
        )
        positives[qid] = matched
    assert all(v is not None for v in positives.values())
    expected = {}
    for qid in queries:
        rows = [r for r in full if r["query_id"] == qid and r["doc_id"] != positives[qid]]
        rows.sort(key=lambda r: (-r["score_micros"], r["doc_id"]))
        expected[qid] = [(i + 1, r["doc_id"], r["score_micros"]) for i, r in enumerate(rows[:10])]
    got = serve.hard_negatives(spark, idx, queries, k=10).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score_micros"])
        )
    for qid in queries:
        assert sorted(by_q[qid]) == expected[qid]
        assert positives[qid] not in {d for _, d, _ in by_q[qid]}


def test_rank_metrics_consistent_with_batch_rank(spark, idx):
    from searchengine_spark.operators import serve
    import math

    queries = {"qa": TERMS, "qb": ["spark", "stream"]}
    run = serve.bm25_batch_topk(spark, idx, queries, k=100000).collect()
    positives = {
        r["query_id"]: r["doc_id"]
        for r in serve._conjunctive_positives(spark, idx, queries).collect()
    }
    got = {r["query_id"]: r for r in serve.rank_metrics(spark, idx, queries, k=10).collect()}
    assert set(got) == set(queries)
    for qid in queries:
        rank = next(
            (r["rank"] for r in run if r["query_id"] == qid and r["doc_id"] == positives[qid]),
            None,
        )
        if rank is not None and rank <= 10:
            assert got[qid]["hit"] == 1
            assert got[qid]["rr_micros"] == round(1e6 / rank)
            assert got[qid]["ndcg_micros"] == round(
                math.log(2.0) / math.log(rank + 1.0) * 1e6
            )
        else:
            assert got[qid]["hit"] == 0 and got[qid]["rr_micros"] == 0


def test_qpp_rare_terms_predict_harder_than_stopword_terms(spark, idx):
    from searchengine_spark.operators import serve

    # a query of rarer terms must show higher avgIDF than one of the
    # corpus's most frequent terms
    lex = idx["lexicon"].orderBy("df").collect()
    rare = [r["term"] for r in lex[:2]]
    common = [r["term"] for r in lex[-2:]]
    out = {
        r["query_id"]: r
        for r in serve.qpp_predictors(
            spark, idx, {"q_rare": rare, "q_common": common, "q_absent": ["zzzq"]}
        ).collect()
    }
    assert out["q_rare"]["avg_idf_micros"] > out["q_common"]["avg_idf_micros"]
    assert out["q_rare"]["n_terms"] == 2 and out["q_common"]["n_terms"] == 2
    # absent-only query emits the zero row, not nothing
    assert out["q_absent"]["n_terms"] == 0 and out["q_absent"]["scq_sum_micros"] == 0


def test_search_after_pages_partition_ranking(spark):
    """Cursor pages are disjoint, ordered, and concatenate to the top-N:
    the search_after total order (score DESC, doc_id ASC) partitions the
    ranking, including across tied scores."""
    from searchengine_spark.operators import serve
    from searchengine_spark.plans.gate_index import gate_index

    idx = gate_index(spark, "/root/testdata/sf0.001")
    terms = ["spark", "hash", "join"]
    pages = [
        [tuple(r) for r in serve.bm25_page(spark, idx, terms, page=p, k=7).collect()]
        for p in (1, 2, 3, 4)
    ]
    flat = sum(pages, [])
    assert len(set(flat)) == len(flat)  # disjoint
    top = [tuple(r) for r in serve.bm25_topk(spark, idx, terms, k=28).collect()]
    assert flat == top  # concatenation IS the ranking, in order


def test_sdm_reduces_to_qld_when_pair_weights_zero(spark, idx):
    """With λ_O = λ_U = 0 the SDM score is the Dirichlet QLD score plus a
    doc-independent constant (|q|·ln μ), so the ranking must be identical
    at the same μ."""
    from searchengine_spark.operators import serve

    sdm = serve.sdm_topk(
        spark, idx, TERMS, k=10, mu=2000.0, lam_t=1.0, lam_o=0.0, lam_u=0.0
    ).collect()
    qld = serve.qld_topk(spark, idx, TERMS, k=10, mu=2000.0).collect()
    assert [r.doc_id for r in sdm] == [r.doc_id for r in qld]


def test_sdm_drops_oov_terms(spark, idx):
    """An out-of-vocabulary query term contributes nothing: not to the
    unigram sum, not to any pair (its adjacencies are skipped), not to the
    length-penalty coefficient — appending one must leave the result
    micros-identical."""
    from searchengine_spark.operators import serve

    base = serve.sdm_topk(spark, idx, TERMS, k=10).collect()
    oov = serve.sdm_topk(spark, idx, TERMS + ["zzzneverseen"], k=10).collect()
    assert [tuple(r) for r in base] == [tuple(r) for r in oov]


def test_significant_terms_properties(spark, idx):
    """Query terms are excluded; every reported term's hit-set rate strictly
    exceeds its corpus rate (the integer cross-multiplication predicate);
    scores are positive and sorted."""
    from searchengine_spark.operators import serve

    rows = serve.significant_terms(spark, idx, TERMS, k=20).collect()
    assert rows, "non-empty at sf0.001"
    n_docs = idx["n_docs"]
    n_hits = (
        serve.term_search_any(spark, idx, TERMS).count()
    )
    scores = [r["score_micros"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r["term"] not in TERMS
        assert r["score_micros"] > 0
        assert r["fg_df"] * n_docs > r["bg_df"] * n_hits
        assert r["fg_df"] <= r["bg_df"]


def test_term_vectors_matches_postings(spark, idx):
    """The forward index is the inverted index re-bucketed: per-doc (term,
    tf) sets must agree exactly between docvecs and postings."""
    from searchengine_spark.operators import serve

    ids = [3, 10, 41]
    tv = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in serve.term_vectors(spark, idx, ids).collect()
    }
    post = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in idx["postings"]
        .filter(F.col("doc_id").isin(ids))
        .select("doc_id", "term", "tf")
        .collect()
    }
    assert tv == post and tv


def test_front_coded_dictionary_roundtrip(spark, idx):
    """Reconstructing term_i = term_{i-1}[:prefix_len] + suffix along each
    (bucket, blk, slot) chain recovers the exact lexicon term set."""
    from searchengine_spark.operators import serve

    rows = serve.front_coded_dictionary(spark, idx, block=8, n_buckets=4).collect()
    assert rows
    rows.sort(key=lambda r: (r["bucket"], r["blk"], r["slot"]))
    rebuilt, prev = set(), {}
    for r in rows:
        rec = (
            r["suffix"]
            if r["slot"] == 0 and r["blk"] == 0 or r["prefix_len"] == 0
            else prev[r["bucket"]][: r["prefix_len"]] + r["suffix"]
        )
        assert rec == r["term"]
        prev[r["bucket"]] = rec
        rebuilt.add(rec)
    lex_terms = {r["term"] for r in idx["lexicon"].select("term").collect()}
    assert rebuilt == lex_terms


def test_nrt_two_tier_fresh_docs_searchable(spark, idx, docs):
    """A term that exists ONLY in the delta batch is retrievable before any
    index rebuild, and every hit is a delta doc (ids shifted +1e9); the
    sealed tier contributes nothing for it (sealed lexicon has no entry)."""
    from __spark_entry__ import _nrt_delta
    from searchengine_spark.operators import serve

    rows = serve.nrt_two_tier_topk(
        spark, idx, _nrt_delta(docs), ["fresh"], k=10
    ).collect()
    assert rows
    assert all(r["doc_id"] >= 1_000_000_000 for r in rows)
    assert all(r["score_micros"] > 0 for r in rows)


def test_bm25plus_dominates_bm25(spark, idx):
    """BM25+ adds idf·δ per matched term, so every candidate's score
    strictly exceeds its plain-BM25 score (δ=1, idf>0 on this corpus)."""
    from searchengine_spark.operators import serve

    base = {
        r["doc_id"]: r["score_micros"]
        for r in serve.bm25_scores(spark, idx, TERMS).collect()
    }
    plus = {
        r["doc_id"]: r["score_micros"]
        for r in serve.bm25plus_topk(spark, idx, TERMS, k=10_000).collect()
    }
    assert set(plus) == set(base)
    assert all(plus[d] > base[d] for d in base)


def test_tombstoned_filters_but_keeps_scores(spark, idx):
    """Tombstoned serving drops doc_id%7==0 and leaves every surviving
    score EXACTLY equal to the stale-stats BM25 score (Lucene liveDocs:
    deletes don't touch statistics until compaction)."""
    from searchengine_spark.operators import serve

    base = {
        r["doc_id"]: r["score_micros"]
        for r in serve.bm25_scores(spark, idx, TERMS).collect()
    }
    rows = serve.bm25_topk_tombstoned(spark, idx, TERMS, tombstoned_mod=7, k=50).collect()
    assert rows
    for r in rows:
        assert r["doc_id"] % 7 != 0
        assert base[r["doc_id"]] == r["score_micros"]


def test_ltr_train_learns_separation(spark, idx):
    """After 3 GD iterations the trained weights must score the positive
    class (docs matching ALL query terms) above the negatives on average —
    the minimal learning-happened check on top of the exact-parity gate."""
    from searchengine_spark.operators import serve

    w = {
        r["j"]: r["weight_micros"]
        for r in serve.ltr_train_logistic(spark, idx, LTR_TERMS, r=50).collect()
    }
    rows = _ltr_feature_rows(spark, idx, LTR_TERMS, r=50)
    zs = {0: [], 1: []}
    for x1, x2, x3, y in rows:
        z = w[0] * 1_000_000 + w[1] * x1 + w[2] * x2 + w[3] * x3
        zs[y].append(z)
    assert zs[0] and zs[1]
    assert sum(zs[1]) / len(zs[1]) > sum(zs[0]) / len(zs[0])


def _ltr_feature_rows(spark, idx, terms, r):
    """Recompute the gate's integer feature rows (mirrors the operator)."""
    from pyspark.sql import functions as F

    from searchengine_spark.operators import serve

    lex_rows = serve._qlex(spark, idx, terms)
    n_q = len({x["term"] for x in lex_rows})
    cand = (
        serve.bm25_scores(spark, idx, terms)
        .orderBy(F.desc("score_micros"), F.asc("doc_id"))
        .limit(r)
    )
    matched = (
        serve._pruned_postings(idx, lex_rows)
        .groupBy("doc_id")
        .agg(F.countDistinct("term").alias("nm"), F.max("dl").alias("dl"))
    )
    base = cand.join(matched, "doc_id").collect()
    smax = max(x["score_micros"] for x in base)
    dlmax = max(x["dl"] for x in base)
    out = []
    for x in base:
        x1 = round(1e6 * x["score_micros"] / smax)
        x2 = (x["nm"] * 1_000_000) // n_q
        x3 = round(1e6 * x["dl"] / dlmax)
        out.append((x1, x2, x3, 1 if x["nm"] == n_q else 0))
    return out
