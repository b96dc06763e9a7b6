"""Deterministic stratified sampling — the corpus-rebalancing step of a
training-data pipeline (e.g. downsample the dominant language before
export). A training-data-pipeline operator; the reference engine has no
sampling stage.

Spark's ``df.sample`` is seeded per-partition and therefore NOT stable
across partition counts or engines. Instead each row gets a uniform
position in [0, 1e6) from an engine-portable content hash (md5 of a
salted key, first 15 hex chars → 60-bit int, mod 1e6 — the same trick as
dedup._token_hash31), and a row is kept iff its position falls under its
stratum's rate. The decision is a pure row-local function of (key,
stratum): no shuffle, no RNG state, identical output on any cluster size
and in the DuckDB oracle — and re-running the pipeline re-selects the
same rows (resumable exports).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def _hash_ppm(key: Column, salt: str) -> Column:
    """Uniform [0, 1e6) position from md5(salt || key) — engine-portable."""
    h60 = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 15), 16, 10
    ).cast("long")
    return h60 % F.lit(PPM)


def stratified_sample(
    docs: DataFrame,
    rates_ppm: dict[str, int],
    default_ppm: int,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    salt: str = "sample:",
) -> DataFrame:
    """(doc_id, stratum) rows kept by a per-stratum Bernoulli sample with
    deterministic hash positions. ``rates_ppm`` maps stratum value → keep
    rate in parts-per-million; strata not listed use ``default_ppm``."""
    rate = None
    for value, ppm in sorted(rates_ppm.items()):
        cond = F.when(F.col(stratum_col) == value, F.lit(ppm))
        rate = cond if rate is None else rate.when(F.col(stratum_col) == value, F.lit(ppm))
    rate = F.lit(default_ppm) if rate is None else rate.otherwise(F.lit(default_ppm))
    return docs.filter(_hash_ppm(F.col(id_col), salt) < rate).select(
        id_col, stratum_col
    )


def temperature_mix(
    docs: DataFrame,
    target_frac_ppm: int = 500_000,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    salt: str = "mix:",
) -> DataFrame:
    """Temperature-based language rebalancing (alpha = 0.5): sample so each
    stratum's share of the output is proportional to sqrt(count) instead of
    count — the multilingual-corpus mixing rule (upweight tail languages,
    downweight the head) used by large-scale pretraining pipelines.

    Per-stratum keep rate: with w_l = sqrt(c_l)/Σ sqrt(c) the target draw
    share, rate_l = min(1, target_frac * w_l * total / c_l). sqrt is
    IEEE-exact-rounded and every float op sits in one literal expression
    tree mirrored by the DuckDB oracle, so the ppm rates — and therefore
    the kept rows — are bit-identical across engines. Keep decisions reuse
    the stratified_sample md5-position trick: pure row-local, stable across
    partition counts and reruns.

    Plan shape: one map-side-combined count per stratum (a |strata|-row
    frame), rates derived in-plan and broadcast-joined back, then a
    scan-and-filter — no shuffle of the corpus, no driver collect.
    """
    c = docs.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("c")
    )
    s = c.withColumn(
        "sl", F.floor(F.sqrt(F.col("c").cast("double")) * F.lit(1e6)).cast("long")
    )
    tot = s.agg(
        F.sum("c").cast("long").alias("total"), F.sum("sl").cast("long").alias("s_sum")
    )
    rate = s.crossJoin(F.broadcast(tot)).select(
        "stratum",
        F.least(
            F.lit(PPM).cast("long"),
            F.floor(
                (
                    F.lit(float(target_frac_ppm))
                    * F.col("sl").cast("double")
                    * F.col("total").cast("double")
                )
                / (F.col("s_sum").cast("double") * F.col("c").cast("double"))
            ).cast("long"),
        ).alias("keep_ppm"),
    )
    return (
        docs.join(F.broadcast(rate), docs[stratum_col] == rate["stratum"])
        .filter(_hash_ppm(F.col(id_col), salt) < F.col("keep_ppm"))
        .select(id_col, stratum_col)
    )
