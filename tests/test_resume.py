"""Resume + determinism guarantees (north rule: checkpoint-resumable;
rank-identity across parallelism levels)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.plans.build_index import build_index, load_index
from searchengine_spark.sources.corpus import generate_corpus

N_DOCS = 120


def _index_hashes(spark, index) -> dict:
    """Content hashes of every index table (order-insensitive)."""
    out = {}
    out["documents"] = index["documents"].select(
        F.bit_xor(F.xxhash64("doc_id", "url", "content_sha256", "doc_len")).alias("h")
    ).collect()[0]["h"]
    out["postings"] = index["postings"].select(
        F.bit_xor(F.xxhash64("term", "doc_id", "tf", F.to_json("positions"))).alias("h")
    ).collect()[0]["h"]
    out["lexicon"] = index["lexicon"].select(
        F.bit_xor(F.xxhash64("term", "df")).alias("h")
    ).collect()[0]["h"]
    out["segments"] = index["segments"].select(
        F.bit_xor(
            F.xxhash64("shard", "term", "block_id", "doc_ids_delta_varint", "tfs_varint")
        ).alias("h")
    ).collect()[0]["h"]
    return out


def test_kill_resume_identical(spark, tmp_path_factory, monkeypatch):
    corpus = generate_corpus(spark, N_DOCS, seed=42, n_partitions=4)

    # uninterrupted reference build
    ref_dir = str(tmp_path_factory.mktemp("ref"))
    build_index(spark, corpus, ref_dir)
    ref = _index_hashes(spark, load_index(spark, ref_dir))

    # killed build: blow up inside the lexicon stage on the first attempt
    kill_dir = str(tmp_path_factory.mktemp("kill"))
    import searchengine_spark.operators.postings as postings_ops

    real = postings_ops.build_lexicon
    calls = {"n": 0}

    def bomb(*a, **kw):
        calls["n"] += 1
        raise RuntimeError("simulated kill during lexicon stage")

    monkeypatch.setattr(postings_ops, "build_lexicon", bomb)
    with pytest.raises(RuntimeError):
        build_index(spark, corpus, kill_dir)
    assert calls["n"] == 1
    monkeypatch.setattr(postings_ops, "build_lexicon", real)

    # resume must complete and produce a byte-identical index
    build_index(spark, corpus, kill_dir)
    got = _index_hashes(spark, load_index(spark, kill_dir))
    assert got == ref

    # and the earlier stages were NOT recomputed: manifest fingerprints match
    import json, os

    with open(os.path.join(kill_dir, "_manifest.json")) as f:
        manifest = json.load(f)
    assert set(manifest["stages"]) >= {"documents_raw", "postings", "lexicon", "segments"}


def test_partitioning_independence(spark, tmp_path_factory):
    """Same corpus, different partition counts → identical index content
    (the sandbox proxy for N vs 4N executors; doc_ids are rank-based)."""
    corpus = generate_corpus(spark, N_DOCS, seed=42)
    a_dir = str(tmp_path_factory.mktemp("p3"))
    b_dir = str(tmp_path_factory.mktemp("p8"))
    build_index(spark, corpus.repartition(3), a_dir, n_partitions=3)
    build_index(spark, corpus.repartition(8), b_dir, n_partitions=8)
    a = _index_hashes(spark, load_index(spark, a_dir))
    b = _index_hashes(spark, load_index(spark, b_dir))
    assert a == b


def test_lineage_metrics_present(spark, tmp_path_factory):
    corpus = generate_corpus(spark, N_DOCS, seed=42, n_partitions=4)
    d = str(tmp_path_factory.mktemp("lin"))
    build_index(spark, corpus, d)
    lineage = spark.read.parquet(f"{d}/lineage")
    stages = {r["stage"] for r in lineage.select("stage").distinct().collect()}
    assert {"documents", "postings", "lexicon", "segments"} <= stages
    post_row = lineage.filter(F.col("stage") == "postings").limit(1).collect()[0]
    assert post_row["postings_out"] > 0
    assert post_row["bytes_compressed"] > 0
    assert post_row["skew_ratio"] >= 1.0
    assert post_row["input_fingerprint"]
