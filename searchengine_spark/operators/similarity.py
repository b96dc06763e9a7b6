"""Similarity search over embedding columns (``array<float>``).

Two paths:
- **brute-force cosine top-k** — the correctness baseline: broadcast the
  (tiny) query set against all vectors; dot/norm via ``zip_with`` +
  sequential ``aggregate`` folds (deterministic left-to-right float order →
  engine-portable), scores as bigint micros, per-query top-k via a window.
- **LSH-bucketed ANN** — the 10^12-scale path: random-hyperplane signatures
  (planes derived deterministically from md5, no RNG state), candidates
  share a signature bucket, exact cosine re-rank within bucket. Join cost is
  linear in corpus size instead of |Q|×N.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def _quantized(arr: Column) -> Column:
    """float32 elements → bigint micros. All inner products then run in
    exact integer arithmetic (order-insensitive, engine-portable); the
    ~1e-6 relative quantization is far below any ANN-relevant resolution."""
    return F.transform(arr, lambda x: F.round(x.cast("double") * 1e6).cast("long"))


def _idot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def cosine_micros(a: Column, b: Column) -> Column:
    """round(1e6 · cos(a,b)) over quantized vectors. The only float ops are
    the final sqrt/divide over exact integers — bit-identical everywhere."""
    qa, qb = _quantized(a), _quantized(b)
    dot = _idot(qa, qb).cast("double")
    na = F.sqrt(_idot(qa, qa).cast("double"))
    nb = F.sqrt(_idot(qb, qb).cast("double"))
    return F.round(F.lit(1e6) * dot / (na * nb)).cast("long")


def ann_bruteforce_topk(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """For each query vector (the first ``n_queries`` by id), the exact
    top-k cosine neighbors (excluding self).

    (query_id, neighbor_id, cosine_micros, rank) — deterministic ties by
    neighbor id."""
    q = embeddings.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    cand = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        cand.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine_micros(F.col("_qv"), F.col("_cv")).alias("cosine_micros"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_micros"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine_micros")
    )


def _hyperplane_sign(vec: Column, plane_id: int, dim: int) -> Column:
    """Sign bit of <v, r_p> where r_p[i] derives deterministically from
    md5(plane_id:i) mapped to [-1, 1] — reproducible on any engine/cluster,
    no RNG state shipped to executors."""
    comps = F.array(
        *[
            (
                F.conv(F.lit(_md5_prefix(f"{plane_id}:{i}")), 16, 10).cast("double")
                / F.lit(float(1 << 40))
                - 1.0
            )
            for i in range(dim)
        ]
    )
    return (F.aggregate(F.zip_with(_as_double(vec), comps, lambda x, y: x * y), F.lit(0.0), lambda a, v: a + v) > 0).cast("int")


def _md5_prefix(s: str) -> str:
    import hashlib

    return hashlib.md5(s.encode()).hexdigest()[:10]  # 40 bits


def ann_lsh_topk(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: random-hyperplane bucket join, exact cosine within
    bucket. Recall < 1.0 by construction (LSH); the scale path for ANN —
    no |Q|×N cross join, candidates come from one equi-join on the bucket."""
    sig = F.concat_ws(
        "", *[_hyperplane_sign(F.col(vec_col), p, dim).cast("string") for p in range(n_planes)]
    )
    buck = embeddings.select(F.col(id_col), F.col(vec_col), sig.alias("bucket"))
    q = buck.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), "bucket"
    )
    cand = buck.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), "bucket")
    scored = (
        cand.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine_micros(F.col("_qv"), F.col("_cv")).alias("cosine_micros"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_micros"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine_micros")
    )


def ivf_assignments(
    embeddings: DataFrame,
    centroid_stride: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """(centroids, assignments) for a deterministic IVF index.

    Centroids are the vectors whose id is a multiple of ``centroid_stride``
    — a seeded selection, not k-means, so the partitioning is a pure
    function of the table (rank-stable across cluster sizes; a k-means job
    can swap in without changing consumers). Every vector is assigned to
    its max-cosine centroid (ties → smallest centroid id); the assignment
    is ONE broadcast join + window over |N| rows, and the resulting
    ``cell`` column is the partition key the inverted lists live under.
    """
    cents = embeddings.filter((F.col(id_col) % centroid_stride) == 0).select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("_cent")
    )
    if not cents.head(1):
        raise ValueError(
            f"no centroid ids: no {id_col} is a multiple of centroid_stride="
            f"{centroid_stride} — lower the stride (ids must include its multiples)"
        )
    scored = embeddings.select(F.col(id_col), F.col(vec_col)).join(F.broadcast(cents)).select(
        id_col, vec_col, "cell", cosine_micros(F.col(vec_col), F.col("_cent")).alias("_cm")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_cm"), F.asc("cell"))
    assign = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, vec_col, "cell")
    )
    return cents, assign


def ann_ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    centroid_stride: int = 64,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: search only the ``nprobe`` cells whose
    centroids are closest to the query (exact cosine within the probed
    cells). The scale path beside LSH: candidate count is |probed cells|,
    not |N|, and the cell column prunes the scan when the index is stored
    partitioned-by-cell. Deterministic end-to-end (quantized-integer
    cosine, id tie-breaks) — the DuckDB oracle reproduces it exactly.
    """
    cents, assign = ivf_assignments(embeddings, centroid_stride, id_col, vec_col)
    q = embeddings.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    qc = q.join(F.broadcast(cents)).select(
        "query_id", "_qv", "cell", cosine_micros(F.col("_qv"), F.col("_cent")).alias("_cm")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("_cm"), F.asc("cell"))
    probed = qc.withColumn("_rn", F.row_number().over(wq)).filter(F.col("_rn") <= nprobe).select(
        "query_id", "_qv", "cell"
    )
    cand = assign.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), "cell")
    scored = (
        cand.join(F.broadcast(probed), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id", cosine_micros(F.col("_qv"), F.col("_cv")).alias("cosine_micros")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_micros"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine_micros")
    )
