"""Materialized trigram index (operators/trigram.py): the index-served
substring/regex paths must be bit-identical to the full-scan operators
(which the driver gates hash-check against DuckDB), the fallbacks must
engage for unindexable queries, and the candidate scan must actually
partition-prune the gram buckets."""

from __future__ import annotations

import contextlib
import io
import os

import pytest

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def tri(spark):
    from searchengine_spark.operators.trigram import trigram_index

    return trigram_index(spark, SF_DIR)


@pytest.fixture(scope="module")
def docs(spark):
    from searchengine_spark.sources.tables import load_table

    return load_table(spark, SF_DIR, "documents")


def test_substring_indexed_equals_scan(spark, tri, docs):
    from searchengine_spark.operators.textstats import substring_search
    from searchengine_spark.operators.trigram import substring_search_indexed

    for needle in ("park", "merge sort", "zzzznotthere"):
        a = sorted(map(tuple, substring_search_indexed(spark, tri, docs, needle).collect()))
        b = sorted(map(tuple, substring_search(docs, needle).collect()))
        assert a == b, needle
    assert sorted(
        map(tuple, substring_search_indexed(spark, tri, docs, "park").collect())
    )  # non-empty by construction ("park" ⊂ "spark")


def test_substring_short_needle_fallback(spark, tri, docs):
    """< 3 chars has no trigrams — the full-scan fallback must serve it."""
    from searchengine_spark.operators.textstats import substring_search
    from searchengine_spark.operators.trigram import substring_search_indexed

    a = sorted(map(tuple, substring_search_indexed(spark, tri, docs, "pa").collect()))
    b = sorted(map(tuple, substring_search(docs, "pa").collect()))
    assert a == b and a


def test_regex_indexed_equals_scan(spark, tri, docs):
    from searchengine_spark.operators.textstats import regex_search
    from searchengine_spark.operators.trigram import regex_search_indexed

    for pat in ("spark|merge", "hash join", "stream.*window"):
        a = sorted(map(tuple, regex_search_indexed(spark, tri, docs, pat).collect()))
        b = sorted(map(tuple, regex_search(docs, pat).collect()))
        assert a == b, pat


def test_candidate_scan_prunes_buckets(spark, tri):
    """The gram scan must keep only the query grams' bucket directories
    (partition pruning) — not read the whole gram store."""
    from searchengine_spark.operators.trigram import (
        N_BUCKETS,
        _buckets_for,
        _candidates_all,
        trigrams_of,
    )

    tris = trigrams_of("park")
    buckets = _buckets_for(spark, tris)
    assert len(buckets) <= len(tris) < N_BUCKETS
    df = _candidates_all(spark, tri, tris)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # partition pruning on the bucket directories…
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "bucket" in pf[0] and "IN" in pf[0]
    want = "(" + ",".join(str(b) for b in buckets) + ")"
    assert want in pf[0].replace(" ", "")
    # …and gram predicate pushdown into the parquet scan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "gram" in pushed[0]


def test_index_is_distinct_per_doc(spark, tri):
    from pyspark.sql import functions as F

    g = tri["grams"]
    dup = (
        g.groupBy("gram", "doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert dup == 0
