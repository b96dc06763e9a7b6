"""Structured Streaming extension (SURVEY.md §2.9: not required by the north
rule — the reference has no streaming — but the natural Spark-first growth
path: ingest new commits continuously instead of batch re-crawl).

Two streaming operators:

- ``stream_corpus_to_postings``: file-source stream over corpus parquet
  drops → same tokenizer (mapInPandas works unchanged on streaming DFs) →
  postings appended via ``foreachBatch`` (each micro-batch is an idempotent
  segment publish keyed by batch id — exactly-once via the same
  write-tmp/rename protocol as the batch build).
- ``stream_events_hourly``: watermarked tumbling-window aggregate over the
  ``events`` table shape — the streaming twin of
  operators/relational.events_hourly.

Tested with the file source + ``processAllAvailable`` (synchronous drain) in
tests/test_streaming.py — no Kafka in the sandbox; on a cluster the source
swaps to kafka/iceberg-cdc without touching the transforms.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.functions.textproc_udfs import POSTINGS_SCHEMA, emit_postings
from searchengine_spark.schemas import CORPUS


def stream_corpus_to_postings(
    spark: SparkSession,
    corpus_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    doc_id_offset_col: str = "commit",
):
    """Continuously tokenize newly-arrived corpus files into postings.

    Streaming doc ids: rank-assignment needs a global sort, which streams
    can't do — instead each row gets a stable 60-bit content-derived id
    (xxhash64 of the natural key, masked positive). Collision probability at
    10^9 docs ≈ 4e-4; the batch compaction job re-assigns dense rank ids.
    """
    stream = (
        spark.readStream.schema(CORPUS)
        .option("maxFilesPerTrigger", 8)
        .parquet(corpus_dir)
    )
    with_ids = stream.withColumn(
        "doc_id",
        F.abs(F.xxhash64("repo", "path", "commit")) % F.lit(1 << 60),
    )
    postings = with_ids.select("doc_id", "content").mapInPandas(emit_postings, POSTINGS_SCHEMA)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # idempotent per-batch publish: overwrite the batch's own directory
        batch_df.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={batch_id}"))

    return (
        postings.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_events_hourly(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    queryName: str = "events_hourly_stream",
    output_mode: str = "complete",
):
    """Tumbling-window count+sum over streaming events.

    Output-mode semantics matter here: in the default ``complete`` mode
    (used by the bounded smoke test — every window re-emitted to the memory
    sink) Spark retains ALL window state and the watermark does NOT drop
    late rows. For an unbounded production stream pass
    ``output_mode="append"``: finalized windows emit once the 2-hour
    watermark passes them, later rows are dropped, and state stays bounded."""
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    stream = spark.readStream.schema(schema).parquet(events_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 1e6).cast("long")).alias("value_micros"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:00:00").alias("hour"),
            "event_type",
            "n",
            "value_micros",
        )
    )
    return (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def stream_dedup_pages(
    spark: SparkSession,
    pages_dir: str,
    checkpoint_dir: str,
    queryName: str = "dedup_stream",
    watermark: str = "1 hour",
):
    """Streaming crawl dedup — the crawler's visited/fingerprint sets
    (F5/F6, Crawler.java:56-78) as a stream: keep the FIRST page per content
    fingerprint, dropping re-fetches that arrive within the watermark
    horizon (``dropDuplicatesWithinWatermark``).

    State is bounded by the watermark: a fingerprint's dedup key is evicted
    once event time passes fetched_at + watermark, so unlike a batch
    ``dropDuplicates`` (or an unwatermarked streaming one) the state store
    never grows with the full crawl history — re-crawls beyond the horizon
    legitimately re-enter (content may have changed; the batch crawl_delta
    path reconciles). Page schema: (url, fingerprint, fetched_at, content).
    """
    schema = "url string, fingerprint string, fetched_at timestamp, content string"
    stream = spark.readStream.schema(schema).parquet(pages_dir)
    deduped = stream.withWatermark("fetched_at", watermark).dropDuplicatesWithinWatermark(
        ["fingerprint"]
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_attribution(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    queryName: str = "attribution_stream",
    window_min: int = 30,
):
    """Watermarked stream-stream interval join — the streaming twin of
    operators/relational.events_attribution: clicks joined to same-user
    purchases that land within ``window_min`` minutes of the click.

    This is the one join class batch DataFrames can't model online: BOTH
    sides arrive continuously, so each side buffers state and the
    time-interval condition + watermarks bound it — a click's state is
    droppable once the watermark passes click_ts + window (no purchase can
    match it anymore), a purchase's once it passes purchase_ts. Append mode
    emits each matched pair exactly once. Output schema and every value are
    identical to the batch twin (tests pin streaming == batch)."""
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def side(event_type: str, idc: str, tsc: str):
        return (
            spark.readStream.schema(schema)
            .parquet(events_dir)
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(idc),
                "user_id",
                F.col("ts").alias(tsc),
            )
            .withWatermark(tsc, "2 hours")
        )

    clicks = side("click", "click_id", "cts")
    purchases = side("purchase", "purchase_id", "pts")
    joined = (
        clicks.alias("c")
        .join(
            purchases.alias("p"),
            F.expr(
                f"""c.user_id = p.user_id AND
                    pts >= cts AND pts <= cts + INTERVAL {window_min} MINUTES"""
            ),
        )
        .select(
            "click_id",
            "purchase_id",
            F.col("c.user_id").alias("user_id"),
            F.expr("timestampdiff(MICROSECOND, cts, pts)").alias("gap_micros"),
        )
    )
    return (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def stream_trending(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    queryName: str = "trending_stream",
    window_min: int = 360,
    slide_min: int = 60,
    output_mode: str = "complete",
):
    """Streaming trending detection: watermarked sliding (hopping) window
    counts per event type — the streaming twin of
    operators/relational.trending_topk. The stream emits window COUNTS
    (rank is not a streaming-aggregable operator); the consumer applies
    relational.rank_windows over the drained table, which is byte-equal to
    the batch gate by construction (same F.window spec, same rank — the
    equality is enforced in tests/test_streaming.py).

    Same output-mode semantics as stream_events_hourly: ``complete`` for
    the bounded smoke test (all windows re-emitted to the memory sink);
    ``append`` + the 2-hour watermark for unbounded production streams
    (finalized windows emit once, state stays bounded by the watermark
    horizon × slide count)."""
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    stream = spark.readStream.schema(schema).parquet(events_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(
            F.window("ts", f"{window_min} minutes", f"{slide_min} minutes").alias("w"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("wstart"),
            "event_type",
            "n",
        )
    )
    return (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
