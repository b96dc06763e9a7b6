"""Invariants the compat_topk DuckDB oracle relies on (serve.compat_topk):

1. the Q11 has-snippet filter is a no-op on the gate corpus — every
   candidate (doc, last_term) has at least one snippet, because the corpus
   text is plain space-separated lowercase words (whitespace-split words ==
   tokens) and the gate query terms are Porter fixed points;
2. the gate query tokenizes to itself (no stemming drift between the query
   side and the simple-tokenizer fixture index).
"""

from __future__ import annotations

import re

from searchengine_spark.functions.porter import porter_stem
from searchengine_spark.functions.textproc import query_tokenize, snippet_windows
from searchengine_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_compat_query_terms_are_porter_fixed():
    import __spark_entry__ as entrymod

    assert query_tokenize(entrymod.COMPAT_QUERY) == entrymod.COMPAT_TERMS
    for t in entrymod.COMPAT_TERMS:
        assert porter_stem(t) == t


def test_corpus_is_plain_text_and_has_any_holds(spark):
    import __spark_entry__ as entrymod

    docs = load_table(spark, SF, "documents").toPandas()
    # plain space-separated lowercase words — words == tokens
    assert not docs["text"].str.contains(r"[^a-z0-9 ]", regex=True).any()
    # has_any: every doc containing a gate term yields >=1 snippet for it
    pat = {t: re.compile(rf"\b{t}\b") for t in entrymod.COMPAT_TERMS}
    checked = 0
    for text in docs["text"]:
        for t, p in pat.items():
            if p.search(text):
                assert snippet_windows(t, text, 60), (t, text[:80])
                checked += 1
    assert checked > 100  # the invariant was actually exercised


def test_compat_topk_matches_oracle(spark):
    import duckdb

    import __spark_entry__ as entrymod
    from tests.conftest import compare_spark_duck, register_views

    con = duckdb.connect()
    register_views(con, SF)
    compare_spark_duck(
        entrymod.queries()["compat_topk"](spark, SF),
        con,
        entrymod.oracle_sql()["compat_topk"],
    )
