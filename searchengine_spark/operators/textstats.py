"""Text analysis for training-data pipelines: token counting, quality
scoring, n-gram-heuristic language ID, document fingerprinting.

All pure Spark built-ins (whole-stage codegen; no UDFs); ratios reported as
bigint micros so the DuckDB oracle matches exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from searchengine_spark.functions.tokenize import TOKEN_SPLIT_RE

STOPWORDS_EN = ["the", "is", "in", "at", "of", "on", "and", "a", "to", "an", "by", "for", "with", "it", "as"]

# tiny marker sets for the n-gram-free language heuristic: count marker-word
# hits per language, argmax with deterministic alphabetical tie-break
LANG_MARKERS = {
    "de": ["der", "die", "das", "und", "nicht", "ist"],
    "en": ["the", "and", "of", "to", "is", "a"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "fr": ["le", "la", "les", "de", "et", "est"],
}


def _tokens(text_col: str) -> Column:
    return F.filter(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_distinct, n_chars, mean_token_len_micros) —
    whitespace/regex token counting entirely array-side (no explode, no
    shuffle: a pure map over the scan)."""
    toks = _tokens(text_col)
    total_len = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    n = F.size(toks)
    return docs.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.when(n > 0, F.round(F.lit(1e6) * total_len.cast("double") / n.cast("double")).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        .alias("mean_token_len_micros"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, stop_ratio_micros, distinct_ratio_micros,
    alnum_ratio_micros, quality_ok) — the standard cheap quality gates
    (length bounds, stopword density, repetitiveness, symbol density)."""
    toks = _tokens(text_col)
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_dist = F.size(F.array_distinct(toks))
    n_chars = F.length(F.col(text_col))
    n_alnum = F.length(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", ""))
    ratio = lambda num, den: F.when(
        den > 0, F.round(F.lit(1e6) * num.cast("double") / den.cast("double")).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    out = docs.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        ratio(n_stop, n).alias("stop_ratio_micros"),
        ratio(n_dist, n).alias("distinct_ratio_micros"),
        ratio(n_alnum, n_chars).alias("alnum_ratio_micros"),
    )
    return out.withColumn(
        "quality_ok",
        (F.col("n_tokens") >= 5)
        & (F.col("n_tokens") <= 100000)
        & (F.col("distinct_ratio_micros") >= 100000),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, lang_score) — marker-word-count language ID.
    Deterministic: argmax over per-language hit counts, ties alphabetical."""
    toks = _tokens(text_col)
    counts = []
    for lang in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        counts.append(
            F.size(F.filter(toks, lambda t: F.array_contains(markers, t))).alias(f"_c_{lang}")
        )
    with_counts = docs.select(F.col(id_col), *counts)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"_c_{lang}") for lang in langs])
    pred = F.lit("und")
    # reverse order so that on ties the alphabetically-first language wins
    for lang in reversed(langs):
        pred = F.when((F.col(f"_c_{lang}") == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return with_counts.select(
        F.col(id_col), pred.alias("lang_pred"), best.cast("long").alias("lang_score")
    )


def doc_fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, content_md5, normalized_md5, token_set_md5) — exact,
    whitespace-insensitive, and order-insensitive fingerprints (the F4
    fingerprint family of Normalize.java:14-36 generalized)."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    tokset = F.concat_ws(" ", F.array_sort(F.array_distinct(_tokens(text_col))))
    return docs.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("content_md5"),
        F.md5(norm).alias("normalized_md5"),
        F.md5(tokset).alias("token_set_md5"),
    )


def strip_html(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, stripped_md5, n_tag_chars) — the F12 tag-strip operator
    (``regexp_replace(html, '<[^>]*>', '')``, SearchService.java:276)
    gated over a deterministically HTML-wrapped rendering of each doc.

    The corpus is plain text (no tags to strip — the reason F12 was N/A in
    round 1), so the gate synthesizes the HTML in-query: wrap the doc in
    ``<html><body><p id="{doc_id}">..</p></body></html>`` and turn every
    space into a ``</p> <p>`` paragraph break. Stripping must return the
    original text exactly (tag removal leaves the inter-tag space), which
    the md5 certifies; ``n_tag_chars`` = how many characters the strip
    removed. Pure built-ins — one map over the scan, no shuffle."""
    html = F.concat(
        F.lit('<html><body><p id="'),
        F.col(id_col).cast("string"),
        F.lit('">'),
        F.regexp_replace(F.col(text_col), " ", "</p> <p>"),
        F.lit("</p></body></html>"),
    )
    stripped = F.regexp_replace(html, "<[^>]*>", "")
    return docs.select(
        F.col(id_col),
        F.md5(stripped).alias("stripped_md5"),
        (F.length(html) - F.length(stripped)).cast("long").alias("n_tag_chars"),
    )
