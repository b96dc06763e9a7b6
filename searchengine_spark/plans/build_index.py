"""End-to-end index build (SURVEY.md §3.3 "ours"):

corpus scan → ingest (sha256 invariant, dedup, deterministic doc_ids)
→ tokenizer UDF (map-only postings) → salted lexicon agg → edges → PageRank
→ documents finalize — each stage atomically published with lineage metrics,
resumable at stage granularity.

Stage boundaries (shuffles): doc_id range exchange, dedup windows, lexicon
salted agg, PR iterations. The tokenizer stage is shuffle-free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.operators import ingest, postings as postings_ops
from searchengine_spark.operators.pagerank import extract_edges, pagerank
from searchengine_spark.plans import lineage as lin


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    n_partitions: int | None = None,
    with_pagerank: bool = True,
    n_salts: int | None = None,
) -> dict:
    """Build (or resume) the full index under ``index_dir``.

    Returns a metrics dict (docs, postings, wall per stage). Safe to re-run:
    stages whose input fingerprint matches the manifest are skipped, and a
    killed run resumes from the last published stage (tests/test_resume.py).
    """
    manifest = lin.IndexManifest(index_dir)
    fp = lin.corpus_fingerprint(corpus)
    metrics: dict = {"input_fingerprint": fp}

    # ---- stage: documents (ingest + doc ids) --------------------------------
    if not manifest.is_done("documents", fp):
        with lin.StageTimer() as t:
            docs = ingest.build_documents(corpus, n_partitions)
            lin.publish_stage(docs, index_dir, "documents_raw")
        docs = spark.read.parquet(os.path.join(index_dir, "documents_raw"))
        per_part = lin.partition_metrics(docs)
        lin.append_lineage(spark, index_dir, "documents", fp, per_part, 0,
                           _dir_bytes(os.path.join(index_dir, "documents_raw")), 1.0, t.wall_ms)
        manifest.mark_done("documents", fp, {"wall_ms": t.wall_ms, "rows": sum(p["rows"] for p in per_part)})
    docs = spark.read.parquet(os.path.join(index_dir, "documents_raw"))

    # ---- stage: postings (map-only tokenizer) -------------------------------
    if not manifest.is_done("postings", fp):
        with lin.StageTimer() as t:
            post = postings_ops.build_postings(docs)
            lin.publish_stage(post, index_dir, "postings")
        post = spark.read.parquet(os.path.join(index_dir, "postings"))
        n_post = post.count()
        skew = postings_ops.skew_ratio(post)
        lin.append_lineage(spark, index_dir, "postings", fp, lin.partition_metrics(post), n_post,
                           _dir_bytes(os.path.join(index_dir, "postings")), skew, t.wall_ms)
        manifest.mark_done("postings", fp, {"wall_ms": t.wall_ms, "postings": n_post, "skew_ratio": skew})
    post = spark.read.parquet(os.path.join(index_dir, "postings"))

    # ---- stage: lexicon (salted df/idf agg) ---------------------------------
    if not manifest.is_done("lexicon", fp):
        n_docs = docs.count()
        salts = n_salts or postings_ops.choose_salts(
            manifest.stage_metrics().get("postings", {}).get("postings", 0),
            int(spark.conf.get("spark.sql.shuffle.partitions")),
        )
        with lin.StageTimer() as t:
            lex = postings_ops.build_lexicon(post, n_docs, salts)
            lin.publish_stage(lex, index_dir, "lexicon")
        lex = spark.read.parquet(os.path.join(index_dir, "lexicon"))
        lin.append_lineage(spark, index_dir, "lexicon", fp, lin.partition_metrics(lex), 0,
                           _dir_bytes(os.path.join(index_dir, "lexicon")), 1.0, t.wall_ms)
        manifest.mark_done("lexicon", fp, {"wall_ms": t.wall_ms, "n_docs": n_docs, "n_salts": salts})

    # ---- stage: compressed segments (delta+varint+block-max) ----------------
    if not manifest.is_done("segments", fp):
        from searchengine_spark.operators.segments import encode_segments

        lex = spark.read.parquet(os.path.join(index_dir, "lexicon"))
        stats = post.groupBy("doc_id").agg(F.first("doc_len").alias("dl")).agg(
            F.sum("dl").alias("s"), F.count(F.lit(1)).alias("c")
        ).collect()[0]
        n_docs_all = docs.count()
        # avgdl over ALL docs (incl. zero-token docs), matching scoring.py
        avgdl = (float(stats["s"] or 0)) / float(n_docs_all) if n_docs_all else 1.0
        with lin.StageTimer() as t:
            seg = encode_segments(post, lex, avgdl)
            lin.publish_stage(seg, index_dir, "segments", partition_by=["bucket"])
        seg = spark.read.parquet(os.path.join(index_dir, "segments"))
        lin.append_lineage(spark, index_dir, "segments", fp, lin.partition_metrics(seg), 0,
                           _dir_bytes(os.path.join(index_dir, "segments")), 1.0, t.wall_ms)
        manifest.mark_done("segments", fp, {"wall_ms": t.wall_ms, "avgdl": avgdl,
                                            "bytes": _dir_bytes(os.path.join(index_dir, "segments"))})

    # ---- stage: edges + pagerank → documents finalize ------------------------
    if not manifest.is_done("documents_final", fp):
        with lin.StageTimer() as t:
            edges = extract_edges(docs)
            lin.publish_stage(edges, index_dir, "edges")
            edges = spark.read.parquet(os.path.join(index_dir, "edges"))
            if with_pagerank:
                pr = pagerank(docs, edges)
            else:
                pr = docs.select("doc_id").withColumn("pagerank", F.lit(0.0))
            # doc_len comes from the postings table (Q15: kept tokens only)
            dl = post.groupBy("doc_id").agg(F.first("doc_len").alias("doc_len"))
            final = (
                docs.join(pr, "doc_id", "left")
                .join(dl, "doc_id", "left")
                .withColumn("pagerank", F.coalesce("pagerank", F.lit(0.0)))
                .withColumn("doc_len", F.coalesce("doc_len", F.lit(0)))
            )
            lin.publish_stage(final, index_dir, "documents")
        final = spark.read.parquet(os.path.join(index_dir, "documents"))
        lin.append_lineage(spark, index_dir, "documents_final", fp, lin.partition_metrics(final), 0,
                           _dir_bytes(os.path.join(index_dir, "documents")), 1.0, t.wall_ms)
        manifest.mark_done("documents_final", fp, {"wall_ms": t.wall_ms})

    metrics.update(manifest.stage_metrics())
    return metrics


def load_index(spark: SparkSession, index_dir: str) -> dict[str, DataFrame]:
    out = {
        "documents": spark.read.parquet(os.path.join(index_dir, "documents")),
        "postings": spark.read.parquet(os.path.join(index_dir, "postings")),
        "lexicon": spark.read.parquet(os.path.join(index_dir, "lexicon")),
        "edges": spark.read.parquet(os.path.join(index_dir, "edges")),
    }
    seg_path = os.path.join(index_dir, "segments")
    if os.path.exists(seg_path):
        out["segments"] = spark.read.parquet(seg_path)
    return out
