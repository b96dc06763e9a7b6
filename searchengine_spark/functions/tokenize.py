"""Tokenization — the fully JVM-side path.

The reference tokenizes imperatively per page (Indexer.java:305-324 splits on
``\\s+``; TextProcessor.java:10-20 lowercases and strips non-letters). Our
*simple* tokenizer expresses the same flatMap family (SURVEY.md §2.3 T3) with
Spark built-ins only — ``lower``/``split``/``posexplode`` — so the whole hot
path stays inside whole-stage codegen with zero Python crossings. The
quirk-faithful tokenizer (crude-stem + Porter, needed for rank-identity with
the reference) lives in ``functions/textproc.py`` as a vectorized pandas UDF.

Token positions index the raw split array *including* empty tokens, mirroring
the reference's "positions count skipped tokens" semantics
(Indexer.java:312-318, quirk Q4) and keeping Spark/DuckDB oracle parity
trivial (both engines keep empties in the split array).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Lowercase alnum runs; everything else is a separator. DuckDB equivalent:
# string_split_regex(lower(text), '[^a-z0-9]+')
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens_array(text: Column) -> Column:
    """``array<string>`` of tokens (empties retained → stable positions)."""
    return F.split(F.lower(text), TOKEN_SPLIT_RE)


def doc_len(text: Column) -> Column:
    """Number of non-empty tokens (the reference's ``totalTerms``,
    Indexer.java:318-319)."""
    return F.size(F.filter(tokens_array(text), lambda t: t != F.lit("")))


def exploded_tokens(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", with_pos: bool = False
) -> DataFrame:
    """One row per (doc, token occurrence): the explode/flatMap operator.

    With ``with_pos`` the 0-based position over the raw split array is kept
    (the positional index needed for phrase adjacency — which the reference
    stored but never used for phrases, quirk Q10; we use it correctly).
    """
    toks = tokens_array(F.col(text_col))
    if with_pos:
        out = df.select(id_col, F.posexplode(toks).alias("pos", "term"))
    else:
        out = df.select(id_col, F.explode(toks).alias("term"))
    return out.filter(F.col("term") != "")


def adjacent_token_pairs(toks: DataFrame) -> DataFrame:
    """(doc_id, pos, t0, t1) — position-adjacent token pairs from an
    ``exploded_tokens(..., with_pos=True)`` frame: t1 directly follows t0 in
    the RAW split array (an empty token between two words breaks adjacency,
    same as the DuckDB twins). Shared by top_bigrams / pmi_top_pairs /
    next_word_suggest so the adjacency convention lives in one place."""
    a = toks.select("doc_id", "pos", F.col("term").alias("t0"))
    b = toks.select(
        F.col("doc_id").alias("_d"),
        (F.col("pos") - 1).alias("_p"),
        F.col("term").alias("t1"),
    )
    return a.join(b, (a.doc_id == b._d) & (a.pos == b._p)).select(
        "doc_id", "pos", "t0", "t1"
    )
