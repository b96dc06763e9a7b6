"""General relational operator coverage over the TPC-H-ish testdata tables:
aggregations, multi-way joins, semi/anti joins, windows, rollup, and
event-time bucketing (the batch twin of a streaming tumbling window).

Money/measure columns are converted to integer cents/micros per row BEFORE
aggregation — bigint sums are exact and associative, so results match the
DuckDB oracle bit-for-bit regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from searchengine_spark.sources.tables import load_table


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100).cast("long")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 family: scan-heavy groupBy with 6 aggregates (A-series).
    revenue_c4 is in 1e-4 currency units (cents × discount-percent)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.withColumn("price_c", _cents("l_extendedprice"))
        .withColumn("qty", F.round(F.col("l_quantity")).cast("long"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qty").alias("sum_qty"),
            F.sum("price_c").alias("sum_base_cents"),
            F.sum(F.col("price_c") * (100 - disc_pct)).alias("revenue_c4"),
            F.count(F.lit(1)).alias("count_order"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.max("qty").alias("max_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_top_orders(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Shipping-priority family: 3-way join (broadcast dim × fact) + agg +
    top-k (J2/O1)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.withColumn("rev_c4", _cents("l_extendedprice") * (100 - disc_pct))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("rev_c4").alias("revenue_c4"))
        .orderBy(F.desc("revenue_c4"), F.asc("l_orderkey"))
        .limit(k)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
            "revenue_c4",
        )
    )


def top_orders_per_customer(spark: SparkSession, sf_dir: str, k: int = 2) -> DataFrame:
    """Window top-k per group (O-series: row_number over partitioned sort)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("price_c"), F.asc("o_orderkey"))
    return (
        orders.withColumn("price_c", _cents("o_totalprice"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("o_custkey", "rn", "o_orderkey", "price_c")
    )


def customers_without_orders(spark: SparkSession, sf_dir: str, since: str = "1998-01-01") -> DataFrame:
    """Anti-join (J6: the 'not yet indexed' pattern) — customers with no
    order since the cutoff (the synthetic data gives every customer SOME
    order, so the unfiltered anti join would be an empty-vs-empty check)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= F.lit(since))
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select("c_custkey")


def suppliers_with_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join (J3: membership filter)."""
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    return supp.join(li, supp.s_suppkey == li.l_suppkey, "left_semi").select("s_suppkey", "s_name")


def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (not in the reference — completeness row of
    SURVEY.md §2.4)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn("price_c", _cents("o_totalprice"))
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("price_c").alias("total_cents"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n",
            "total_cents",
        )
    )


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregate, batch form (the Structured Streaming twin
    lives in streaming/ingest.py): per (hour, event_type) count + exact
    value sum in micros."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("v_micros", F.round(F.col("value") * 1e6).cast("long"))
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias("hour"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v_micros").alias("value_micros"))
    )


def events_sessionize(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Sessionization via lag + cumulative gap counting (window functions) —
    (user_id, session_id, n_events, first_ts, last_ts)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; session TZ is pinned UTC so epoch == DuckDB's
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    with_flag = ev.withColumn(
        "new_session", F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    )
    with_sid = with_flag.withColumn(
        "session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_sid.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        )
    )


def events_asof_prior(spark: SparkSession, sf_dir: str, anchor_type: str = "purchase", ref_type: str = "click") -> DataFrame:
    """As-of lookup (Spark has no native ASOF JOIN — pyspark_guide "common
    OLAP patterns"): for each ``anchor_type`` event, the timestamp of the
    most recent prior-or-equal ``ref_type`` event of the same user, via a
    last_value(ignoreNulls) window over the merged per-user timeline —
    one shuffle, no range join explosion."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = ev.withColumn(
        "_ref_ts", F.when(F.col("event_type") == ref_type, F.col("ts"))
    ).withColumn("asof_ref_ts", F.last("_ref_ts", ignorenulls=True).over(w))
    return (
        marked.filter(F.col("event_type") == anchor_type)
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            F.date_format("asof_ref_ts", "yyyy-MM-dd HH:mm:ss").alias("asof_ref_ts"),
        )
    )


def events_attribution(
    spark: SparkSession, sf_dir: str, window_min: int = 30
) -> DataFrame:
    """Interval (time-bounded) join — the attribution primitive beside the
    as-of lookup: every (click, purchase) pair of the same user with the
    purchase inside ``[click_ts, click_ts + window_min]`` (all qualifying
    pairs, multi-touch; first/last-touch are a groupBy away).

    Scale shape: user-keyed equi-join (co-partitioned shuffle, never a
    time-range cross join — the range predicate evaluates inside each
    user's partition, and a user's events are bounded). The streaming twin
    (streaming/ingest.stream_attribution) runs the IDENTICAL join as a
    watermarked stream-stream join; tests pin streaming == batch.

    Output: (click_id, purchase_id, user_id, gap_micros)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("cts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("pts")
    )
    return (
        clicks.join(purchases, "user_id")
        .filter(
            (F.col("pts") >= F.col("cts"))
            & (F.col("pts") <= F.col("cts") + F.expr(f"INTERVAL {window_min} MINUTES"))
        )
        .select(
            "click_id",
            "purchase_id",
            "user_id",
            F.expr("timestampdiff(MICROSECOND, cts, pts)").alias("gap_micros"),
        )
    )


def events_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-rank quantiles per event_type over integer micros. Explicit
    row_number definition (value at row ceil(q·n)) instead of interpolating
    `percentile` — engine interpolation formulas differ by ULPs, nearest
    rank is definitionally exact everywhere."""
    ev = load_table(spark, sf_dir, "events")
    v = F.round(F.col("value") * 1e6).cast("long")
    w = Window.partitionBy("event_type").orderBy("v")
    ranked = (
        ev.withColumn("v", v)
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("event_type")))
    )
    return ranked.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == F.ceil(F.col("n") * 0.5).cast("long"), F.col("v"))).alias("p50_micros"),
        F.max(F.when(F.col("rn") == F.ceil(F.col("n") * 0.95).cast("long"), F.col("v"))).alias("p95_micros"),
        F.min("v").alias("min_micros"),
        F.max("v").alias("max_micros"),
    )


def heavy_hitter_terms(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Exact heavy hitters: top-k terms by total occurrences across the
    corpus (ties by term asc) — the A-series hot-key detector feeding the
    salted-agg decision."""
    from searchengine_spark.functions.tokenize import exploded_tokens

    docs = load_table(spark, sf_dir, "documents")
    return (
        exploded_tokens(docs)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("occurrences"), F.countDistinct("doc_id").alias("df"))
        .orderBy(F.desc("occurrences"), F.asc("term"))
        .limit(k)
    )


def events_pivot_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per user, event counts spread across type columns (O-series
    pivot/unpivot coverage; fixed column set so the schema is static)."""
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "view", "purchase"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .select(
            "user_id",
            *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in types],
        )
    )


def lineitem_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer moments per returnflag (sums of cents / cross products
    as bigints) + correlation derived from them in one final float
    expression — statistics ops without float-sum nondeterminism."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.round(F.col("l_quantity")).cast("long")
    p = F.round(F.col("l_extendedprice") * 100).cast("long")
    agg = (
        li.select("l_returnflag", q.alias("q"), p.alias("p"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("q").alias("sum_q"),
            F.sum("p").alias("sum_p"),
            F.sum(F.col("q") * F.col("q")).alias("sum_qq"),
            F.sum(F.col("p") * F.col("p")).alias("sum_pp"),
            F.sum(F.col("q") * F.col("p")).alias("sum_qp"),
        )
    )
    n = F.col("n").cast("double")
    cov = F.col("sum_qp").cast("double") / n - (F.col("sum_q").cast("double") / n) * (F.col("sum_p").cast("double") / n)
    var_q = F.col("sum_qq").cast("double") / n - (F.col("sum_q").cast("double") / n) * (F.col("sum_q").cast("double") / n)
    var_p = F.col("sum_pp").cast("double") / n - (F.col("sum_p").cast("double") / n) * (F.col("sum_p").cast("double") / n)
    return agg.select(
        "l_returnflag", "n", "sum_q", "sum_p", "sum_qq", "sum_pp", "sum_qp",
        F.round(cov / (F.sqrt(var_q) * F.sqrt(var_p)) * 1e6).cast("long").alias("corr_micros"),
    )


def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all combinations — completes the grouping-set
    family next to ROLLUP)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn("price_c", _cents("o_totalprice"))
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("price_c").alias("total_cents"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total_cents",
        )
    )


def doc_length_histogram(spark: SparkSession, sf_dir: str, bucket_width: int = 10) -> DataFrame:
    """Token-count histogram over documents (width-10 buckets) — the
    doc-length distribution every BM25 tuning session starts from."""
    from searchengine_spark.functions.tokenize import doc_len

    docs = load_table(spark, sf_dir, "documents")
    bucket = (doc_len(F.col("text")) / bucket_width).cast("long") * bucket_width
    return (
        docs.select(bucket.alias("len_bucket"))
        .groupBy("len_bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def top_bigrams(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Top-k token bigrams by occurrence (ties by bigram asc) — n-gram
    statistics over the corpus (position-adjacent pairs, empties skipped)."""
    from searchengine_spark.functions.tokenize import adjacent_token_pairs, exploded_tokens

    docs = load_table(spark, sf_dir, "documents")
    pairs = adjacent_token_pairs(exploded_tokens(docs, with_pos=True))
    return (
        pairs.select(F.concat_ws(" ", "t0", "t1").alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .orderBy(F.desc("occurrences"), F.asc("bigram"))
        .limit(k)
    )


def user_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily activity with a returning-user flag (lag window over
    day buckets) — the retention-analysis building block."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("user_id", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = Window.partitionBy("user_id").orderBy("day")
    return daily.withColumn(
        "returned_next_day",
        (F.lead("day").over(w) == F.date_format(F.date_add(F.to_date("day"), 1), "yyyy-MM-dd")),
    ).select(
        "user_id", "day", "n_events", F.coalesce("returned_next_day", F.lit(False)).alias("returned_next_day")
    )


def events_hopping_window(
    spark: SparkSession, sf_dir: str, window_min: int = 60, slide_min: int = 15
) -> DataFrame:
    """Sliding (hopping) window counts — each event lands in
    window/slide overlapping windows (F.window with a slideDuration; the
    tumbling case is events_hourly). Epoch-aligned starts, so the DuckDB
    oracle reproduces the window set exactly."""
    ev = load_table(spark, sf_dir, "events")
    w = F.window("ts", f"{window_min} minutes", f"{slide_min} minutes")
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("wstart"),
            "event_type",
            "n",
        )
    )


def trending_topk(
    spark: SparkSession,
    sf_dir: str,
    window_min: int = 360,
    slide_min: int = 60,
    k: int = 3,
) -> DataFrame:
    """Trending detection: the top-k event types per sliding window —
    the "trending searches" feature of a search stack, as a batch operator
    whose window semantics are IDENTICAL to the streaming twin
    (streaming/ingest.py::stream_trending uses the same F.window spec, so
    the drained stream ranks to exactly these rows; equality is pytest-
    enforced in test_streaming).

    Shape at scale: the hopping-window aggregate is map-side combined
    (each event expands to window/slide rows before the partial agg); the
    rank window partitions by wstart — thousands of windows, each bounded
    by |event types|, never a global or corpus-sized partition. Output
    (wstart, rank, event_type, n)."""
    ev = load_table(spark, sf_dir, "events")
    w = F.window("ts", f"{window_min} minutes", f"{slide_min} minutes")
    counts = (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("wstart"),
            "event_type",
            "n",
        )
    )
    return rank_windows(counts, k=k)


def rank_windows(counts: DataFrame, k: int) -> DataFrame:
    """Per-window top-k rank over (wstart, event_type, n) counts — shared
    by the batch gate and the streaming drain (the stream emits counts;
    this is the consumer-side rank both paths agree on)."""
    rw = Window.partitionBy("wstart").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= k)
        .select("wstart", "rank", "event_type", "n")
    )


def next_word_suggest(spark: SparkSession, sf_dir: str, word: str, k: int = 5) -> DataFrame:
    """Bigram-model autocomplete: the top-k words FOLLOWING ``word`` in the
    corpus, by occurrence — the next-word analog of the prefix suggester.
    The word filter is pushed below the position-adjacency self-join, so
    the joined left side is only the query word's occurrences."""
    from searchengine_spark.functions.tokenize import adjacent_token_pairs, exploded_tokens

    docs = load_table(spark, sf_dir, "documents")
    pairs = adjacent_token_pairs(exploded_tokens(docs, with_pos=True))
    return (
        pairs.filter(F.col("t0") == word)
        .groupBy(F.col("t1").alias("term"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(k)
    )


def events_moving_avg(spark: SparkSession, sf_dir: str, hours: int = 1) -> DataFrame:
    """Trailing time-RANGE window frame: per event, the count / sum / mean
    of ``value`` over the user's preceding ``hours`` (RANGE BETWEEN
    <interval> PRECEDING AND CURRENT ROW) — the value-based frame class the
    row-number windows elsewhere don't exercise.

    Exactness: values quantize to bigint micros BEFORE the frame sum (a
    sliding float sum would associate differently per engine — DuckDB uses
    segment-tree aggregation); the frame key is microsecond epoch (exact
    integer both sides); mean = integer division (values nonnegative, so
    floor == truncate). Partition = user_id: bounded per-user event counts,
    the events_sessionize shuffle shape."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        "user_id",
        # ts is TIMESTAMP_NTZ; the session TZ is pinned UTC, so the cast is
        # the identity and matches DuckDB's naive epoch_us
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.round(F.col("value") * 1e6).cast("long").alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us").rangeBetween(
        -hours * 3_600_000_000, 0
    )
    return (
        base.select(
            "event_id",
            "user_id",
            F.count(F.lit(1)).over(w).alias("n_trailing"),
            F.sum("v").over(w).alias("sum_micros"),
        )
        .withColumn("avg_micros", F.expr("sum_micros div n_trailing"))
    )


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel over the event stream — the product-
    analytics staple (view → click → purchase): a user advances to a step
    only with an event at-or-after their entry into the previous step
    (first-touch semantics: min timestamps).

    Every join is user-keyed (co-partitioned aggregates, no windows, no
    skew: a user's events are bounded); the three stage counts are 1-row
    aggregates unioned in-plan. Output: (step, step_name, n_users)."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    def stage(df: DataFrame, step: int, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(step).cast("long").alias("step"),
            F.lit(name).alias("step_name"),
            "n_users",
        )
    return stage(v, 1, "view").unionByName(stage(c, 2, "click")).unionByName(
        stage(p, 3, "purchase")
    )


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention-cohort matrix — the second product-analytics
    staple beside the funnel: users cohorted by their signup week, counted
    once per later week in which they show ANY activity.

    ``week_offset`` = whole weeks between the cohort week and the activity
    week (both Monday-truncated, day-diff // 7 — pure date arithmetic, no
    epoch conversions, so TIMESTAMP_NTZ parity is trivial). The distinct
    (user, week) dedup and the count are user-keyed map-side-combined
    aggregates; the signup table joins back on user_id — co-partitioned,
    no windows.

    Output: (cohort_week, week_offset, n_users)."""
    ev = load_table(spark, sf_dir, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.date_trunc("week", F.col("ts"))).alias("cw"))
    )
    act = (
        ev.select("user_id", F.date_trunc("week", F.col("ts")).alias("aw"))
        .join(su, "user_id")
        .filter(F.col("aw") >= F.col("cw"))
        .select(
            "user_id",
            F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
            (
                F.datediff(F.to_date("aw"), F.to_date("cw")) / 7
            ).cast("long").alias("week_offset"),
        )
        .distinct()
    )
    return act.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


def events_json_stats(spark: SparkSession, sf_dir: str, bucket_width: int = 10) -> DataFrame:
    """Semi-structured extraction — the schema-on-read pass every event
    pipeline runs over a JSON properties column: pull ``$.k`` out of the
    ``props`` string (Spark ``get_json_object``; JSON never leaves the
    executors) and aggregate a per-(event_type, k-bucket) histogram with
    exact integer sums.

    One map + one map-side-combined aggregate; extraction is a row-local
    scalar, so the shuffle carries only the (type, bucket) partials.
    Output: (event_type, k_bucket, n, sum_k)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy(
            "event_type",
            (F.col("k") - F.pmod(F.col("k"), F.lit(bucket_width))).alias("k_bucket"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
        )
    )
