"""The end-to-end LLM training-data prep plan, as ONE composed job:

    quality filter -> exact dedup (canonical winner) -> benchmark
    decontamination -> stratified sampling -> token-window chunking

Each stage is an already-gated operator (quality_score, exact_dedup_groups,
decontaminate, stratified_sample, doc_chunks) — this module just composes
them, and the DuckDB oracle composes the SAME stages by embedding each
stage's gate SQL verbatim as a subquery, so the pipeline's correctness is
provably the conjunction of the per-stage gates (no restated predicates to
drift).

Order of operations at scale: every per-doc predicate (quality, sample
keep, canonical-winner membership) reduces to a doc_id set built from slim
projections; the expensive stage (chunking, which rematerializes token
arrays) runs LAST, over only the surviving docs (left-semi join pushes the
survivor set into the documents scan). The oracle chunks first and filters
after — legal because chunks are per-doc — which keeps its SQL a literal
reuse of doc_chunks_sql.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prepare_training_chunks(
    docs: DataFrame,
    rates_ppm: dict[str, int],
    default_ppm: int,
    ngram: int = 5,
    bench_mod: int = 17,
    bench_rem: int = 3,
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """(doc_id, chunk_id, start_pos, n_tokens, chunk_md5) for every chunk of
    every SURVIVING document: quality_ok, canonical under exact dedup, not
    in/contaminated-by the benchmark slice, kept by the stratified sample."""
    from searchengine_spark.operators.dedup import decontaminate, exact_dedup_groups
    from searchengine_spark.operators.sampling import stratified_sample
    from searchengine_spark.operators.textstats import doc_chunks, quality_score

    ok = quality_score(docs).filter(F.col("quality_ok")).select("doc_id")
    canonical = exact_dedup_groups(docs).select(
        F.col("canonical_doc_id").alias("doc_id")
    )
    sampled = stratified_sample(docs, rates_ppm, default_ppm).select("doc_id")
    contaminated = decontaminate(
        docs, n=ngram, bench_mod=bench_mod, bench_rem=bench_rem
    ).select("doc_id")
    keep = (
        ok.join(canonical, "doc_id")
        .join(sampled, "doc_id")
        .filter(F.col("doc_id") % bench_mod != bench_rem)  # bench slice itself
        .join(contaminated, "doc_id", "left_anti")
    )
    survivors = docs.join(keep, "doc_id", "left_semi")
    return doc_chunks(survivors, chunk_size=chunk_size, stride=stride)
