"""Boolean query parser unit tests (pure Python — no Spark session) plus a
small evaluated equivalence check against the term_search primitives."""

from __future__ import annotations

import pytest

from searchengine_spark.operators.boolquery import (
    BoolQueryError,
    boolean_query_sql,
    leaf_terms,
    parse,
)


def test_precedence_not_and_or():
    # NOT > AND > OR
    assert parse("a OR b AND NOT c") == (
        "or",
        [("term", "a"), ("and", [("term", "b"), ("not", ("term", "c"))])],
    )


def test_implicit_and_by_juxtaposition():
    assert parse("a b c") == parse("a AND b AND c")


def test_parens_override_precedence():
    assert parse("(a OR b) AND c") == (
        "and",
        [("or", [("term", "a"), ("term", "b")]), ("term", "c")],
    )


def test_keywords_uppercase_only_terms_lowercased():
    # Lucene classic-parser convention: only uppercase AND/OR/NOT are
    # operators; lowercase "and" is an ordinary (implicit-AND) search term
    assert parse("spark and hash") == (
        "and",
        [("term", "spark"), ("term", "and"), ("term", "hash")],
    )
    assert parse("Spark AND HASH") == parse("spark AND hash")
    assert leaf_terms(parse("Spark OR Stream")) == {"spark", "stream"}


def test_positive_leaf_terms_excludes_negations():
    from searchengine_spark.operators.boolquery import positive_leaf_terms

    ast = parse("(a AND NOT b) OR (c AND d)")
    assert positive_leaf_terms(ast) == {"a", "c", "d"}
    assert leaf_terms(ast) == {"a", "b", "c", "d"}


@pytest.mark.parametrize(
    "bad",
    [
        "",  # empty
        "a AND",  # dangling operator
        "(a OR b",  # missing close
        "a)",  # stray close
        "NOT a",  # pure negation (unsatisfiable without a positive set)
        "NOT a AND NOT b",  # conjunction of only negations
        "NOT NOT a",  # double negation
        "a OR NOT b",  # negation outside a conjunction
        "AND a",  # keyword where a term was expected
    ],
)
def test_malformed_queries_rejected(bad):
    with pytest.raises(BoolQueryError):
        parse(bad)


def test_sql_generation_shapes():
    sql = boolean_query_sql("(a AND b) OR (c AND NOT d)")
    assert "INTERSECT" in sql and "UNION" in sql and "EXCEPT" in sql
    # (a AND b) compiles to the INTERSECT branch, (c AND NOT d) to EXCEPT
    left, right = sql.rsplit("UNION", 1)
    assert "INTERSECT" in left and "EXCEPT" not in left.split("WITH")[-1].split("(SELECT")[-1]
    assert "EXCEPT" in right and "INTERSECT" not in right


def test_boolean_query_matches_term_search_ops(spark):
    """(A AND B) == term_search_all, (A OR B) == term_search_any doc sets,
    and AND NOT == term_search_except — evaluated on the gate index."""
    from searchengine_spark.operators import serve
    from searchengine_spark.operators.boolquery import boolean_query
    from searchengine_spark.plans.gate_index import gate_index
    from tests.test_plans import SF_DIR

    idx = gate_index(spark, SF_DIR)

    def ids(df):
        return sorted(r["doc_id"] for r in df.select("doc_id").distinct().collect())

    assert ids(boolean_query(spark, idx, "spark AND stream")) == ids(
        serve.term_search_all(spark, idx, ["spark", "stream"])
    )
    assert ids(boolean_query(spark, idx, "spark OR stream")) == ids(
        serve.term_search_any(spark, idx, ["spark", "stream"])
    )
    assert ids(boolean_query(spark, idx, "spark AND NOT stream")) == ids(
        serve.term_search_except(spark, idx, ["spark"], ["stream"])
    )
    # unknown term evaluates to the empty set, not an error
    assert ids(boolean_query(spark, idx, "spark AND zzzzz")) == []
