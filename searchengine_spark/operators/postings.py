"""Postings emission + lexicon aggregation (SURVEY.md §2.3 T3, §2.4 A1-A3).

Key scale property: the tokenizer UDF emits one row per **(doc, term)** with
tf/positions already folded per doc — there is NO shuffle to build postings
(the reference's per-term Mongo upsert storm, DBController.java:84-127,
becomes a map-only stage). The only wide operations are:

- the lexicon df aggregation, keyed by ``term`` — hot "code stopwords"
  (return/import/def) make this skewed at 10^12 scale, so it runs as a
  **salted two-phase aggregate** (north rule: "salted repartitioning to
  defuse stopword-term skew");
- the segment groupBy (operators/segments.py), keyed by (term, bucket).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.functions.textproc_udfs import (
    POSTINGS_SCHEMA,
    emit_postings,
    emit_postings_arrow,
)

DEFAULT_SALTS = 16


def build_postings(documents: DataFrame) -> DataFrame:
    """documents(doc_id, content, ...) → postings rows (map-only stage).

    If the input arrives in fewer splits than the cluster has cores (small
    files coalesced by the scan planner), repartition up first — the
    tokenizer is the CPU-bound stage and must use every core. At real scale
    the file splits already exceed core count and this is a no-op."""
    narrow = documents.select("doc_id", "content")
    parallelism = documents.sparkSession.sparkContext.defaultParallelism
    # Driver-side file metadata only (no .rdd access — that would force an
    # RDD conversion plan); small-file coalescing is the case we care about,
    # a big file splits into >1 task on its own.
    n_files = len(documents.inputFiles()) or 1
    if n_files < parallelism:
        narrow = narrow.repartition(parallelism)
    return narrow.mapInArrow(emit_postings_arrow, POSTINGS_SCHEMA)


def build_lexicon(postings: DataFrame, n_docs: int, n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """(term, df, cf, idf_compat, idf_bm25) via salted two-phase aggregation.

    Phase 1 groups by (term, salt) where salt = pmod(hash(doc_id), S) —
    every reducer sees at most |postings(term)|/S rows of a hot term.
    Phase 2 sums the S partials per term. Postings are unique per (term,
    doc), so count == countDistinct(doc) (the reference's df double-count on
    re-index, quirk Q7, is structurally impossible here).

    ``cf`` (collection frequency, sum of tf) rides the same shuffle for
    free; sum(cf) over the tiny lexicon equals sum(tf) over all postings
    equals sum(doc_len) over all docs (every kept token adds 1 to both), so
    the build derives avgdl from the lexicon footprint instead of paying a
    second full postings scan.
    """
    partial = (
        postings.withColumn("_salt", F.pmod(F.hash("doc_id"), F.lit(n_salts)))
        .groupBy("term", "_salt")
        .agg(
            F.count(F.lit(1)).alias("_partial_df"),
            F.sum("tf").alias("_partial_cf"),
        )
    )
    n = F.lit(float(n_docs))
    df_ = F.col("df").cast("double")
    return (
        partial.groupBy("term")
        .agg(
            F.sum("_partial_df").alias("df"),
            F.sum("_partial_cf").alias("cf"),
        )
        .select(
            "term",
            "df",
            "cf",
            F.log(n / (df_ + 1.0)).alias("idf_compat"),  # Indexer.java:184 (Q9)
            F.log(F.lit(1.0) + (n - df_ + 0.5) / (df_ + 0.5)).alias("idf_bm25"),
        )
    )


def skew_ratio(postings: DataFrame, n_buckets: int | None = None) -> float:
    """max/mean postings per term-hash bucket — the lineage skew metric
    persisted per build (north rule)."""
    if n_buckets is None:
        n_buckets = int(postings.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    per_bucket = (
        postings.groupBy(F.pmod(F.hash("term"), F.lit(n_buckets)).alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"), F.avg("n").alias("mean"))
        .collect()[0]
    )
    if not per_bucket["mean"]:
        return 1.0
    return float(per_bucket["mx"]) / float(per_bucket["mean"])


TARGET_ROWS_PER_REDUCER = 5_000_000


def choose_salts(n_postings: int, n_partitions: int) -> int:
    """Salt count sized to the data: a worst-case hot term owning ~10% of
    all postings must fan out into partials of ≤ TARGET_ROWS_PER_REDUCER
    rows, and never fewer salts than partitions (so a hot term can occupy
    every reducer). Bounded above to keep the phase-2 row count sane."""
    if n_postings <= 0:
        return DEFAULT_SALTS
    hot_term_rows = n_postings // 10
    by_volume = math.ceil(hot_term_rows / TARGET_ROWS_PER_REDUCER)
    return int(min(4096, max(DEFAULT_SALTS, n_partitions, by_volume)))
