"""Query-time scoring: reference-compat (Ranker.java) and BM25 modes.

The compat scorer reproduces Ranker.java:30-97 exactly (quirks Q3, Q9, Q14,
Q15), but as ONE hash aggregate + ONE per-query window instead of the
reference's N+1 Mongo lookups per posting (SearchService.java:301-302):

    score = 0.4 * tfIdfSum/maxTfIdf            (tf = freq/totalTerms)
          + 0.3 * pagerank/maxPageRank
          + 0.7 * titleMatches/|Query_Words|
          + min(headerScore, 0.45)

- maxTfIdf / maxPageRank are per-query maxima over the candidate set (A6) —
  a cross-candidate window, not a global constant;
- headerScore accumulates 0.45/0.25/0.1 per matched (term,doc) posting with
  term-level header flags, capped at 0.45 (Q14);
- titleMatches counts query-word containment in the title once per matched
  posting row (so multi-term matches inflate it — reference behavior);
- Query_Words comes from the broken split regex (Q3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TITLE_WEIGHT = 0.7
H1_WEIGHT, H2_WEIGHT, H3_WEIGHT = 0.45, 0.25, 0.1
TFIDF_WEIGHT = 0.4
PAGERANK_WEIGHT = 0.3

BM25_K1 = 1.2
BM25_B = 0.75


def _match_postings(postings: DataFrame, lexicon: DataFrame, qterms: DataFrame) -> DataFrame:
    """Candidate postings for the query terms: broadcast the tiny query-term
    set against both tables (J1 — the reference's per-term point lookups)."""
    return postings.join(F.broadcast(qterms), "term").join(
        F.broadcast(lexicon.join(F.broadcast(qterms), "term")), "term"
    )


def compat_score_candidates(
    spark: SparkSession,
    postings: DataFrame,
    lexicon: DataFrame,
    documents: DataFrame,
    query_terms: list[str],
    query_words: list[str],
) -> DataFrame:
    """(doc_id, url, title, score) for all candidate docs, unsorted.

    One aggregate per doc + per-query max window. The only non-broadcast
    join is candidates ⋈ documents on doc_id (sort-merge / shuffled hash by
    size — Catalyst's choice, AQE re-plans on runtime stats).
    """
    if not query_terms:
        return spark.createDataFrame([], "doc_id long, url string, title string, score double")
    qterms = spark.createDataFrame([(t,) for t in dict.fromkeys(query_terms)], "term string")

    matched = _match_postings(postings, lexicon, qterms)
    docs_side = documents.select("doc_id", "url", "title", "pagerank")

    n_qwords = len(query_words)
    lower_title = F.lower(F.col("title"))
    title_matches_per_row = None
    for w in query_words:
        c = F.when(lower_title.contains(w.lower()), 1).otherwise(0)
        title_matches_per_row = c if title_matches_per_row is None else title_matches_per_row + c

    per_doc = (
        matched.join(docs_side, "doc_id")
        .select(
            "doc_id",
            "url",
            "title",
            "pagerank",
            ((F.col("tf").cast("double") / F.col("doc_len").cast("double")) * F.col("idf_compat")).alias("_tfidf"),
            (
                F.when(F.col("term_h1"), H1_WEIGHT).otherwise(0.0)
                + F.when(F.col("term_h2"), H2_WEIGHT).otherwise(0.0)
                + F.when(F.col("term_h3"), H3_WEIGHT).otherwise(0.0)
            ).alias("_hdr"),
            title_matches_per_row.alias("_tm"),
        )
        .groupBy("doc_id", "url", "title")
        .agg(
            F.sum("_tfidf").alias("tfidf_sum"),
            F.sum("_hdr").alias("header_score"),
            F.sum("_tm").alias("title_matches"),
            F.max("pagerank").alias("pr"),
        )
    )

    # A6: query-set-relative normalizers (Ranker.java:76-81; orElse(1.0) only
    # matters for empty candidate sets, which return empty here anyway)
    w = Window.partitionBy()
    scored = per_doc.select(
        "doc_id",
        "url",
        "title",
        (
            F.lit(TFIDF_WEIGHT) * (F.col("tfidf_sum") / F.max("tfidf_sum").over(w))
            + F.lit(PAGERANK_WEIGHT) * (F.col("pr") / F.max("pr").over(w))
            + F.lit(TITLE_WEIGHT) * (F.col("title_matches").cast("double") / F.lit(float(n_qwords)))
            + F.least(F.col("header_score"), F.lit(H1_WEIGHT))
        ).alias("score"),
    )
    return scored


def bm25_score_candidates(
    spark: SparkSession,
    postings: DataFrame,
    lexicon: DataFrame,
    documents: DataFrame,
    query_terms: list[str],
) -> DataFrame:
    """(doc_id, url, score) under textbook BM25 (Robertson idf), raw tf +
    doc_len from the index; avgdl from the documents table."""
    if not query_terms:
        return spark.createDataFrame([], "doc_id long, url string, score double")
    qterms = spark.createDataFrame([(t,) for t in dict.fromkeys(query_terms)], "term string")
    stats = documents.agg(
        F.sum("doc_len").alias("s"), F.count(F.lit(1)).alias("c")
    ).collect()[0]
    avgdl = (float(stats["s"]) / float(stats["c"])) if stats["c"] else 1.0

    tf = F.col("tf").cast("double")
    dl = F.col("doc_len").cast("double")
    contrib = F.col("idf_bm25") * (tf * (BM25_K1 + 1.0)) / (
        tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / F.lit(avgdl))
    )
    return (
        _match_postings(postings, lexicon, qterms)
        .select("doc_id", contrib.alias("_c"))
        .groupBy("doc_id")
        .agg(F.sum("_c").alias("score"))
        .join(documents.select("doc_id", "url"), "doc_id")
        .select("doc_id", "url", "score")
    )
