"""Connected components over the near-duplicate candidate graph —
the clustering step of a dedup pipeline (pairs → groups → one kept doc
per group). The reference engine has no graph stage; this is a
training-data-pipeline operator (VERDICT "LLM-data-pipeline" family),
expressed as an iterative DataFrame fixpoint like operators/pagerank.py.

Algorithm: min-label propagation. Every node starts labeled with its own
id; each round replaces a node's label with the min over its closed
neighborhood; at the fixpoint every node carries the min doc_id of its
component. All labels are int64 — the fixpoint is exact and the DuckDB
oracle (a recursive reachability CTE) reproduces it bit-for-bit.

Scale: each round is one shuffle join of the (symmetrized) edge list with
the label table — linear in |E| per round, and the round count is the
graph diameter. Near-dup components are shallow (cliques and dense blobs
from LSH banding), so a handful of rounds suffices at any corpus size;
for adversarial long-chain graphs swap the body for alternating
large-star/small-star contraction (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14), which is O(log d) rounds over the
same join primitive. ``localCheckpoint`` truncates the lineage each round
exactly as the PageRank loop does (pagerank.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_rounds: int = 50,
) -> DataFrame:
    """(doc_id, component_id) for every node; component_id = min node id in
    the node's connected component. Isolated nodes form singleton
    components. ``edges`` may be directed pairs — they are symmetrized."""
    # materialize the edge list ONCE — the loop below re-reads it every
    # round, and without this the whole upstream pipeline (e.g. the MinHash
    # banding that produced the pairs) would re-execute per round
    sym = edges.select(
        F.col(a_col).alias("_a"), F.col(b_col).alias("_b")
    ).union(edges.select(F.col(b_col).alias("_a"), F.col(a_col).alias("_b")))
    sym = sym.localCheckpoint(eager=True)

    labels = nodes.select(F.col(id_col).alias("_id"), F.col(id_col).alias("_comp"))
    labels = labels.localCheckpoint(eager=True)

    def label_sum(df: DataFrame) -> int:
        # labels only ever decrease, so the (exact, overflow-safe) sum is a
        # convergence probe that costs one narrow agg on checkpointed data —
        # no extra join per round
        row = df.agg(F.sum(F.col("_comp").cast("decimal(38,0)")).alias("s")).collect()[0]
        return int(row["s"] or 0)

    prev_sum = label_sum(labels)
    for _ in range(max_rounds):
        nb_min = (
            sym.join(labels.select(F.col("_id").alias("_b"), "_comp"), "_b")
            .groupBy("_a")
            .agg(F.min("_comp").alias("_nb"))
            .select(F.col("_a").alias("_id"), "_nb")
        )
        new_labels = labels.join(nb_min, "_id", "left").select(
            "_id", F.least(F.col("_comp"), F.coalesce("_nb", F.col("_comp"))).alias("_comp")
        )
        # pointer jump (path halving): follow the label one hop — labels are
        # always node ids with comp(j) <= j, so comp(comp(v)) <= comp(v) and
        # chains collapse in O(log diameter) rounds instead of O(diameter)
        hop = new_labels.select(F.col("_id").alias("_hid"), F.col("_comp").alias("_hcomp"))
        new_labels = (
            new_labels.join(hop, new_labels["_comp"] == hop["_hid"], "left")
            .select("_id", F.least(F.col("_comp"), F.coalesce("_hcomp", F.col("_comp"))).alias("_comp"))
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        new_sum = label_sum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels.select(
        F.col("_id").alias(id_col), F.col("_comp").alias("component_id")
    )


def dedup_clusters(
    docs: DataFrame,
    n_perms: int = 16,
    rows_per_band: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, component_id) — near-duplicate clusters: connected
    components over the MinHash-LSH band graph. component_id is the min
    doc_id of the cluster, i.e. the deterministic canonical representative
    a dedup pipeline would keep.

    The edges are STAR edges — every doc links to the min doc_id of each
    band bucket it falls in — NOT the all-candidate pairs: a duplicate-
    dense bucket of m docs yields m-1 star edges where the pair join
    yields m², and the connected components are provably identical (two
    docs share a bucket ⇔ both link to its hub; connectivity through hubs
    equals connectivity through pairs). This is what keeps clustering
    linear on corpora that are mostly duplicates — the situation dedup
    exists for. The DuckDB gate oracle walks the pair graph instead and
    lands on the same components (same connectivity relation)."""
    from searchengine_spark.operators.dedup import minhash_bands

    bands = minhash_bands(docs, n_perms, rows_per_band, id_col, text_col)
    hubs = bands.groupBy("band_id", "band_key").agg(F.min(id_col).alias("_hub"))
    edges = (
        bands.join(hubs, ["band_id", "band_key"])
        .filter(F.col(id_col) != F.col("_hub"))
        .select(F.col(id_col).alias("doc_a"), F.col("_hub").alias("doc_b"))
        .distinct()
    )
    return connected_components(docs.select(id_col), edges, id_col=id_col)


def dedup_survivors(
    docs: DataFrame,
    n_perms: int = 16,
    rows_per_band: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The keep-list a dedup pipeline actually consumes: one row per
    near-dup cluster — (doc_id, cluster_size) where doc_id is the
    deterministic canonical representative (the cluster's min id) and
    cluster_size counts the docs it stands for (1 = unique doc).

    One aggregate over :func:`dedup_clusters`; downstream stages left-semi
    join this against the corpus to drop every non-canonical duplicate.
    Scale shape: the clusters frame is (doc, label) pairs — the groupBy is
    a map-side-combinable count keyed by component, never hot (a component
    key repeats only as often as its cluster size)."""
    clusters = dedup_clusters(docs, n_perms, rows_per_band, id_col, text_col)
    return (
        clusters.groupBy("component_id")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .select(F.col("component_id").alias("doc_id"), "cluster_size")
    )


def cluster_cap_sample(
    docs: DataFrame,
    max_per_cluster: int = 2,
    n_perms: int = 16,
    rows_per_band: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    salts: int = 8,
) -> DataFrame:
    """(doc_id, component_id, rank) — SOFT dedup: keep up to
    ``max_per_cluster`` docs per near-dup cluster instead of one survivor
    (the diversity-preserving variant public pretraining pipelines apply
    when exact one-per-cluster drops too much data); rank = the doc's
    deterministic position within its cluster (by ascending id), so
    downstream can tighten the cap without re-clustering.

    Scale shape: per-cluster selection is the salted two-phase bounded
    top-k (rank within (component, id mod salts) slots first, then within
    the component) — a boilerplate mega-cluster never lands its full
    membership on one window task, the same discipline as serve's grouped
    top-k. Everything else reuses :func:`dedup_clusters`."""
    from pyspark.sql import Window

    clusters = dedup_clusters(docs, n_perms, rows_per_band, id_col, text_col)
    partial = Window.partitionBy(
        "component_id", F.pmod(F.col(id_col), F.lit(salts))
    ).orderBy(F.asc(id_col))
    final = Window.partitionBy("component_id").orderBy(F.asc(id_col))
    return (
        clusters.withColumn("_pr", F.row_number().over(partial))
        .filter(F.col("_pr") <= max_per_cluster)
        .withColumn("rank", F.row_number().over(final).cast("int"))
        .filter(F.col("rank") <= max_per_cluster)
        .select(id_col, "component_id", "rank")
    )
