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
