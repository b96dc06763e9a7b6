"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 top-k on sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query (same column names).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from searchengine_spark import oracles
from searchengine_spark.operators import ir
from searchengine_spark.sources.tables import load_table

SF0001 = "/root/testdata/sf0.001"

# fixed reference query set over the documents vocabulary
BM25_TERMS = ["spark", "hash", "join"]
TFIDF_TERMS = ["merge", "sort", "window"]
ALL_TERMS = ["vector", "stream", "window"]
PHRASE = ["hash", "join"]
TOPK = 10


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: BM25 top-k over documents at sf0.001."""
    from searchengine_spark.session import ship_package

    ship_package(spark)  # harness-created sessions: workers get the package
    docs = load_table(spark, SF0001, "documents")
    return ir.bm25_topk(spark, docs, BM25_TERMS, k=TOPK)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "postings_tf": lambda spark, sf: ir.postings(_docs(spark, sf)),
        "lexicon_stats": lambda spark, sf: _lexicon_stats(spark, sf),
        "bm25_topk": lambda spark, sf: ir.bm25_topk(
            spark, _docs(spark, sf), BM25_TERMS, k=TOPK
        ),
        "tfidf_topk": lambda spark, sf: ir.tfidf_topk(
            spark, _docs(spark, sf), TFIDF_TERMS, k=TOPK
        ),
        "term_search_all": lambda spark, sf: ir.term_search_all(
            spark, _docs(spark, sf), ALL_TERMS
        ),
        "phrase_match": lambda spark, sf: ir.phrase_match(_docs(spark, sf), PHRASE),
    }


def _lexicon_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    n_docs = docs.count()
    lex = ir.lexicon(ir.postings(docs), n_docs)
    return lex.select(
        "term",
        "df",
        F.round(F.col("idf_bm25") * 1e6).cast("long").alias("idf_bm25_micros"),
        F.round(F.col("idf_compat") * 1e6).cast("long").alias("idf_compat_micros"),
    )


def oracle_sql() -> dict[str, str]:
    return {
        "postings_tf": oracles.postings_sql(),
        "lexicon_stats": oracles.lexicon_sql(),
        "bm25_topk": oracles.bm25_topk_sql(BM25_TERMS, k=TOPK),
        "tfidf_topk": oracles.tfidf_topk_sql(TFIDF_TERMS, k=TOPK),
        "term_search_all": oracles.term_search_all_sql(ALL_TERMS),
        "phrase_match": oracles.phrase_match_sql(PHRASE),
    }
