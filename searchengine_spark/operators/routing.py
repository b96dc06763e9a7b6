"""Shard routing: rendezvous (highest-random-weight) hashing of documents
onto index shards.

The reference serves its whole index from one MongoDB ``Terms`` collection
(DBController.java:48); at web scale the index is served by S shards and
every document must be routed to exactly one. Rendezvous hashing (Thaler &
Ravishankar, "Using Name-Based Mappings to Increase Hit Rates", 1996 — the
scheme behind modern stateless sharding) gives:

- **stateless routing** — shard(doc) = argmax_s h(doc, s); no routing table
  to store, replicate, or invalidate; any executor/worker computes the same
  route from the key alone;
- **minimal disruption** — growing S → S+1 moves only the keys whose new
  argmax IS the new shard (≈ 1/(S+1) of them) and never moves a key between
  two old shards (the old weights are untouched).
  ``tests/test_pipeline_ops.py::test_rendezvous_stability`` asserts both.

The weight is the engine-portable md5-derived 60-bit integer (the
``dedup._token_hash31`` family), so Spark and DuckDB compute bit-identical
routes. The plan is a per-row projection over S constant expressions — no
shuffle, no UDF, whole-stage codegen; at 10^12 docs routing is a free map
stage fused into whichever scan feeds it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _weight(doc_id: Column, shard: int) -> Column:
    """60-bit rendezvous weight of (doc, shard): md5('route:<id>:<s>')."""
    key = F.concat(F.lit("route:"), doc_id.cast("string"), F.lit(f":{shard}"))
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def route_expr(id_col: Column, n_shards: int) -> Column:
    """The rendezvous argmax as a plain column expression, for fusing the
    route into any scan/projection (e.g. federated serving's scatter key).

    ``array_max`` over (weight, shard) structs is the argmax: struct
    comparison is lexicographic, so equal weights (never observed with a
    60-bit hash, but defined anyway) break toward the larger shard id —
    mirrored by the SQL twin's ``ORDER BY wt DESC, s DESC``."""
    pairs = F.array(
        *[
            F.struct(_weight(id_col, s).alias("w"), F.lit(s).alias("s"))
            for s in range(n_shards)
        ]
    )
    return F.array_max(pairs)["s"].cast("int")


def rendezvous_route(
    docs: DataFrame, n_shards: int, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, shard) — each doc routed to argmax_s weight(doc, s)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        route_expr(F.col(id_col), n_shards).alias("shard"),
    )


def rebalance_moves(
    docs: DataFrame, n_from: int, n_to: int, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, shard_from, shard_to) — the exact MOVE SET when the shard
    fleet resizes ``n_from`` → ``n_to``: the rows an elastic resharding job
    must copy (everything else stays put, which is rendezvous hashing's
    whole point — growing S → S+1 relocates only keys whose argmax IS a
    new shard, ≈ 1/(S+1) of the corpus, and never shuffles a key between
    two surviving shards).

    Plan: both routes are constant-expression projections fused into one
    scan — no shuffle, no state; at 10^12 docs the move list streams out
    of the same map stage that reads the corpus. The pytest twin
    (test_rendezvous_stability) asserts the minimal-disruption property;
    the driver gate hash-checks the move set itself."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        route_expr(F.col(id_col), n_from).alias("shard_from"),
        route_expr(F.col(id_col), n_to).alias("shard_to"),
    ).filter(F.col("shard_from") != F.col("shard_to"))
