"""S3 exclusion-rule filter (robots.txt analog) + fingerprint edge cases."""

from pyspark.sql import functions as F

from searchengine_spark.operators.ingest import apply_exclusions, with_invariants
from searchengine_spark.sources.corpus import generate_corpus


def test_apply_exclusions(spark):
    corpus = generate_corpus(spark, 100, seed=42)
    total = corpus.count()
    out = apply_exclusions(
        corpus,
        [
            {"repo_prefix": "org0/"},
            {"path_prefix": "docs/"},
            {"lang": "md", "path_prefix": "README"},
        ],
    )
    kept = out.collect()
    assert 0 < len(kept) < total
    for r in kept:
        assert not r["repo"].startswith("org0/")
        assert not r["path"].startswith("docs/")
        assert not (r["lang"] == "md" and r["path"].startswith("README"))
    # empty rules = identity
    assert apply_exclusions(corpus, []).count() == total


def test_fingerprint_whitespace_insensitive(spark):
    df = spark.createDataFrame(
        [("r", "a", "c1", "txt", "hello   world"), ("r", "b", "c2", "txt", "hello world")],
        "repo string, path string, commit string, lang string, content string",
    )
    fps = [r["fingerprint"] for r in with_invariants(df).collect()]
    assert fps[0] == fps[1]  # collapsed whitespace -> same fingerprint


def test_doc_ids_equal_global_rank_at_any_bucket_count(spark):
    """assign_doc_ids must produce EXACTLY rank-in-(repo,path,commit)-order
    regardless of how many sampled-boundary buckets it uses — the bucket
    count is a load-balance knob, never a semantic one (north-rule
    rank-identity across N/4N parallelism rides on this)."""
    from searchengine_spark.operators.ingest import SORT_KEY, assign_doc_ids

    corpus = generate_corpus(spark, 300, seed=7).select(*SORT_KEY)
    expected = {
        (r["repo"], r["path"], r["commit"]): i
        for i, r in enumerate(
            sorted(corpus.collect(), key=lambda r: (r["repo"], r["path"], r["commit"]))
        )
    }
    for n_buckets in (1, 3, 16):
        got = assign_doc_ids(corpus, n_partitions=n_buckets).collect()
        assert len(got) == len(expected)
        for r in got:
            assert r["doc_id"] == expected[(r["repo"], r["path"], r["commit"])], n_buckets
