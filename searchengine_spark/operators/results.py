"""Result assembly: the reference's search-response shape, index-served.

The reference materializes every hit as ``{term, url, title, snippet, id}``
(SearchService.convertDocumentsToResults, SearchService.java:391-423) with
``snippet = snippets[0]`` — the first pre-rendered 60-word window of the
page's last-processed term (quirks Q11/Q12). Round 1 covered this shape only
in the pytest oracle suite; this module gates it: BM25 top-k from the gate
index, then url/title lookup and a 60-word centered snippet rendered at
query time for the <=k candidate docs.

Snippet contract (the simple-tokenizer analog of
Indexer.getCenteredTermSnippets, Indexer.java:354-394, so the DuckDB oracle
can replicate it bit-for-bit — the Porter-stemmed variant stays covered by
tests/oracle.py):

- ``words = split(text, '\\s+')`` (raw, punctuated words);
- a word *matches* the snippet term iff the term appears in the word's
  simple-token list (``split(lower(word), '[^a-z0-9]+')``) — the same
  tokenizer that built the index, so every candidate doc has a match;
- the window centers on the FIRST matching word: ``start = max(0, i - 30)``,
  ``end = min(n, start + 60)``, ``start = max(0, end - 60)`` (the
  reference's clipping rules);
- matching words inside the window are wrapped in ``<b>..</b>``, words are
  space-joined, ``'... '`` / ``' ...'`` ellipses mark clipped edges;
- snippet term = the lexicographically LAST matched query term of the doc
  (the pinned Q12 "last processed term" order).

Everything here is Catalyst higher-order functions over <=k rows — the
per-element lambda interpretation cost is bounded by k, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.functions.tokenize import TOKEN_SPLIT_RE

SNIPPET_WORDS = 60


def _word_matches(word: Column, term: Column) -> Column:
    """Word-vs-term match under the simple-tokenizer contract."""
    return F.array_contains(F.split(F.lower(word), TOKEN_SPLIT_RE), term)


def snippet_expr(words: Column, term: Column, n_words: int = SNIPPET_WORDS) -> Column:
    """60-word centered, bolded, ellipsized snippet as one Catalyst
    expression (null when the term never matches — callers on index-served
    candidates never see that).

    ``words`` must be a MATERIALIZED array attribute (not a Project alias
    of ``split(text, ...)``): Catalyst inlines aliases into higher-order-
    function lambdas, so an aliased split would re-run per word index —
    O(words^2) per doc (the dedup._token_ngrams trap). search_results
    materializes it through an ``explode(array(...))`` Generate barrier."""
    half = n_words // 2
    n = F.size(words)
    # first matching word index (0-based): filter the position sequence
    pos = F.filter(
        F.sequence(F.lit(0), n - 1),
        lambda j: _word_matches(F.element_at(words, j + 1), term),
    )
    i = F.get(pos, 0)  # null-safe (ANSI element_at throws on empty arrays)
    start = F.greatest(F.lit(0), i - half)
    end = F.least(n, start + n_words)
    start = F.greatest(F.lit(0), end - n_words)
    window = F.slice(words, start + 1, end - start)
    bolded = F.transform(
        window,
        lambda w: F.when(_word_matches(w, term), F.concat(F.lit("<b>"), w, F.lit("</b>"))).otherwise(w),
    )
    body = F.array_join(bolded, " ")
    return F.when(
        i.isNotNull(),
        F.concat(
            F.when(start > 0, F.lit("... ")).otherwise(F.lit("")),
            body,
            F.when(end < n, F.lit(" ...")).otherwise(F.lit("")),
        ),
    )


def search_results(
    spark: SparkSession,
    idx: dict,
    documents: DataFrame,
    query_terms: list[str],
    k: int = 10,
    doc_filter: DataFrame | None = None,
) -> DataFrame:
    """Index-served BM25 top-k assembled into the reference's response shape:
    ``(rank, doc_id, term, url, title, snippet, score_micros)``.

    Plan: bm25_topk (pruned postings scan + broadcast lexicon + bounded
    top-k) → broadcast the <=k winners against documents for url/title/text
    (one equi-join, hit side broadcast) → snippet expression over k rows.

    ``doc_filter`` (a ``doc_id`` DataFrame) restricts candidates BEFORE the
    top-k bound — the REST phrase path passes the positional phrase-match
    doc set here, mirroring the reference's filter-then-rank phrase flow
    (SearchService.handlePhraseSearch, SearchService.java:99-133) but
    filtering on true positional adjacency instead of snippet scans.
    """
    from pyspark.sql import Window

    from searchengine_spark.operators import serve

    if doc_filter is None:
        top = serve.bm25_topk(spark, idx, query_terms, k=k)
    else:
        top = (
            serve.bm25_scores(spark, idx, query_terms)
            .join(doc_filter.select("doc_id"), "doc_id", "left_semi")
            .orderBy(F.desc("score_micros"), F.asc("doc_id"))
            .limit(k)
        )
    empty_schema = (
        "rank int, doc_id long, term string, url string, title string, "
        "snippet string, score_micros long"
    )
    rows = serve._qlex(spark, idx, query_terms)
    if not rows:
        return spark.createDataFrame([], empty_schema)
    # the <=k winners are collected so their doc_ids PUSH DOWN into both
    # the postings scan and the documents scan (parquet row-group pruning
    # on the doc_id-clustered files) — a broadcast-join key never reaches
    # the reader, so without this every request decoded the whole corpus's
    # text column just to probe a k-row hash table (the same rank-first
    # overfetch rule search_compat uses)
    top_rows = top.collect()
    if not top_rows:
        return spark.createDataFrame([], empty_schema)
    ids = [int(r["doc_id"]) for r in top_rows]
    top_df = spark.createDataFrame(
        [(int(r["doc_id"]), int(r["score_micros"])) for r in top_rows],
        "doc_id long, score_micros long",
    )
    # last matched term per winning doc (Q12 pinned order): tiny pruned
    # postings pass restricted to the k winners
    post = serve._pruned_postings(idx, rows)
    last_term = (
        post.filter(F.col("doc_id").isin(ids))
        .groupBy("doc_id")
        .agg(F.max("term").alias("term"))
    )
    # url/title derived exactly as the compat fixture does (documents.parquet
    # has no url/title columns): url = doc://{source}/{doc_id}, title = first
    # 48 chars — the convertDocumentsToResults field mapping
    docs_side = documents.filter(F.col("doc_id").isin(ids)).select(
        "doc_id",
        F.concat(
            F.lit("doc://"), F.col("source"), F.lit("/"), F.col("doc_id").cast("string")
        ).alias("url"),
        F.substring("text", 1, 48).alias("title"),
        F.col("text").alias("_text"),
    )
    joined = docs_side.join(F.broadcast(top_df), "doc_id").join(
        F.broadcast(last_term), "doc_id"
    )
    # Generate barrier: the word array becomes a real attribute, evaluated
    # once per row, before the per-word snippet lambdas touch it
    barrier = joined.select(
        "doc_id",
        "term",
        "url",
        "title",
        "score_micros",
        F.explode(F.array(F.split(F.col("_text"), r"\s+"))).alias("_words"),
    )
    out = barrier.withColumn(
        "snippet", snippet_expr(F.col("_words"), F.col("term"))
    ).filter(F.col("snippet").isNotNull())  # Q11: empty-snippet hits dropped
    w = Window.partitionBy(F.col("doc_id") % 1).orderBy(
        F.desc("score_micros"), F.asc("doc_id")
    )
    return out.select(
        F.row_number().over(w).alias("rank"),
        "doc_id",
        "term",
        "url",
        "title",
        "snippet",
        "score_micros",
    )
