"""Corpus → documents ingest (SURVEY.md §2.2 F1-F6, §1.2).

All row-level work is Spark built-ins (whole-stage codegen): sha256 invariant,
content fingerprint, URL key, dedup. The one scale-sensitive step is the
deterministic dense ``doc_id`` assignment — done with the two-phase
range-sort + partition-offset technique instead of a single global window
(which would serialize on one task at 10^12 rows). IDs depend only on the
total order of the unique key (repo, path, commit), so they are identical at
any parallelism level — the north rule's rank-identity between N and 4N
executors hinges on this (monotonically_increasing_id is rejected for
exactly that reason, SURVEY.md §4.2-5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SORT_KEY = ["repo", "path", "commit"]


def with_invariants(corpus: DataFrame) -> DataFrame:
    """Add url/title/sha256/fingerprint/headers columns (pure built-ins).

    - ``content_sha256``: the per-row ingest invariant (BASELINE.json).
    - ``fingerprint``: the reference's content fingerprint
      (Normalize.java:14-36: NFD → ASCII fold → collapse whitespace →
      lowercase → MD5 → base64). For ASCII corpora NFD+fold is the identity,
      so the whole expression stays JVM-side; non-ASCII corpora can swap in a
      pandas-UDF fingerprint without touching callers.
    - ``headers``: [has #, has ##, has ###] markdown analog of h1-h3 presence
      (Indexer.java:216-219).
    """
    norm = F.lower(F.trim(F.regexp_replace(F.col("content"), r"\s+", " ")))
    return (
        corpus.withColumn("url", F.concat_ws("", F.concat_ws("/", "repo", "path"), F.lit("@"), F.col("commit")))
        .withColumn("title", F.element_at(F.split("path", "/"), -1))
        .withColumn("content_sha256", F.sha2(F.col("content"), 256))
        .withColumn("fingerprint", F.base64(F.unhex(F.md5(norm))))
        .withColumn(
            "headers",
            F.array(
                F.col("content").rlike(r"(?m)^# "),
                F.col("content").rlike(r"(?m)^## "),
                F.col("content").rlike(r"(?m)^### "),
            ),
        )
    )


def dedup(docs: DataFrame) -> DataFrame:
    """Dedup by URL then by content fingerprint (Crawler.java:56-78, F5/F6).

    Deterministic winner: smallest (repo, path, commit) — a min_by per key,
    expressed as a window row_number so it is one shuffle per key column.
    """
    w_url = Window.partitionBy("url").orderBy(*SORT_KEY)
    w_fp = Window.partitionBy("fingerprint").orderBy(*SORT_KEY)
    return (
        docs.withColumn("_rn", F.row_number().over(w_url))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn("_rn", F.row_number().over(w_fp))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def assign_doc_ids(docs: DataFrame, n_partitions: int | None = None) -> DataFrame:
    """Dense, deterministic doc_id = rank in the global (repo,path,commit)
    order — scalable two-phase assignment:

    1. range-repartition + sort within partitions on the key;
    2. per-partition ordinal via a window partitioned by the physical
       partition id (no second shuffle — data is already colocated);
    3. add broadcast per-partition offsets.

    Stage count: one range-exchange, one tiny driver-side offset collect.
    """
    spark = docs.sparkSession
    if n_partitions is None:
        n_partitions = max(int(spark.conf.get("spark.sql.shuffle.partitions")), 1)

    sorted_df = docs.repartitionByRange(n_partitions, *SORT_KEY).sortWithinPartitions(*SORT_KEY)
    # PIN the partitioned data before reading it twice: repartitionByRange
    # samples to pick boundaries, so re-evaluating the plan can move rows
    # between partitions — the per-partition counts would then disagree with
    # the window pass and produce overlapping ids. localCheckpoint makes the
    # boundary draw happen exactly once. (Found by the scaling bench: doc
    # counts differed between local[8] and local[32] before this.)
    with_pid = sorted_df.withColumn("_pid", F.spark_partition_id()).localCheckpoint(eager=True)
    counts = {r["_pid"]: r["cnt"] for r in with_pid.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_df = F.broadcast(
        spark.createDataFrame([(pid, off) for pid, off in offsets.items()], "_pid int, _offset long")
    )
    w = Window.partitionBy("_pid").orderBy(*SORT_KEY)
    return (
        with_pid.withColumn("_rn", F.row_number().over(w))
        .join(offset_df, "_pid")
        .withColumn("doc_id", (F.col("_offset") + F.col("_rn") - 1).cast("long"))
        .drop("_pid", "_rn", "_offset")
    )


def build_documents(corpus: DataFrame, n_partitions: int | None = None) -> DataFrame:
    """corpus → documents (without doc_len/pagerank, added by later stages).

    The dedup windows + doc_id range-sort + checkpoint all run over a SLIM
    projection (keys + derived metadata, no content) — at 10^12-file scale
    those are three shuffles of ~200-byte rows instead of full documents.
    Content crosses at most ONE shuffle, in the final join back on the
    table's primary key (repo, path, commit); when the id side fits under
    the broadcast threshold it crosses none. Precondition: (repo, path,
    commit) is unique in the input (the Iceberg table's identity — the url
    and fingerprint dedups still collapse logical duplicates).
    """
    slim = with_invariants(corpus).drop("content", "lang")
    ids = assign_doc_ids(dedup(slim), n_partitions)
    return ids.join(corpus.select(*SORT_KEY, "lang", "content"), list(SORT_KEY))


def verify_sha256_invariant(corpus: DataFrame, documents: DataFrame) -> int:
    """Ingest invariant (BASELINE.json input_hint): every surviving document
    row carries sha2(content,256) equal to its corpus row. Returns violation
    count (0 == pass). Anti-join keyed on the natural key + hash."""
    c = corpus.select("repo", "path", "commit", F.sha2("content", 256).alias("expected"))
    d = documents.select("repo", "path", "commit", F.col("content_sha256").alias("actual"))
    return (
        d.join(c, ["repo", "path", "commit"], "left")
        .filter((F.col("expected").isNull()) | (F.col("expected") != F.col("actual")))
        .count()
    )


def apply_exclusions(corpus: DataFrame, rules: list[dict]) -> DataFrame:
    """Exclusion-rule filter — the corpus analog of robots.txt denylists
    (RobotsTxtHandler.java:31-78, SURVEY.md S3): drop rows whose repo/path
    matches any rule. Rules are a tiny broadcast table; the check is a
    broadcast LEFT ANTI join on prefix/lang predicates (the reference's
    per-URL prefix scan, vectorized).

    rule: {"repo_prefix": str|None, "path_prefix": str|None, "lang": str|None}
    — conjunctive within a rule, disjunctive across rules.
    """
    spark = corpus.sparkSession
    if not rules:
        return corpus
    deny = spark.createDataFrame(
        [
            (r.get("repo_prefix"), r.get("path_prefix"), r.get("lang"))
            for r in rules
        ],
        "repo_prefix string, path_prefix string, lang string",
    )
    cond = (
        (deny.repo_prefix.isNull() | corpus.repo.startswith(deny.repo_prefix))
        & (deny.path_prefix.isNull() | corpus.path.startswith(deny.path_prefix))
        & (deny.lang.isNull() | (corpus.lang == deny.lang))
    )
    return corpus.join(F.broadcast(deny), cond, "left_anti")
