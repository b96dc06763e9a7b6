"""Physical-layout operators: multi-dimensional clustering keys.

``zorder_layout`` computes the Z-order (Morton) key that write-time
clustering sorts by — THE data-layout primitive for 100 TB scan pruning
(Delta OPTIMIZE ZORDER, Iceberg sort orders, Hudi clustering all use it).
A table range-partitioned and sorted by the interleaved key keeps rows
that are close in EVERY clustered dimension inside the same parquet row
groups, so min/max footer stats prune scans for predicates on user_id,
on event time, or on both — where a single-column sort only ever prunes
one of them.

Everything is exact integer arithmetic (min/max normalize → fixed-width
scale → bit interleave), so the DuckDB oracle reproduces the key
bit-for-bit and the operator is engine-portable.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave(x: Column, y: Column, bits: int) -> Column:
    """Morton-interleave two ``bits``-wide non-negative ints: bit i of x
    lands at position 2i, bit i of y at 2i+1. A static expression tree
    (2·bits shift/mask/or terms) that stays inside whole-stage codegen."""
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda a, b: a + b, parts)


def zorder_layout(
    events: DataFrame,
    bits: int = 16,
    n_groups: int = 64,
) -> DataFrame:
    """(event_id, zval, file_group): the Z-order clustering key over
    (user_id, event time) plus the file-group id a writer would
    range-partition by.

    Each dimension is min/max-normalized to ``bits`` bits with exact
    integer arithmetic — sx = ⌊(v − min)·(2^bits − 1) / (max − min)⌋ —
    then bit-interleaved; ``file_group`` is the top log2(n_groups) bits of
    the key, so group boundaries are fixed Z-curve ranges (a pure function
    of the key: no sort, no sampling pass needed to assign groups).

    Scale shape: the min/max bounds are ONE 4-value aggregate broadcast
    back as a 1-row cross join; everything else is a map-only projection
    (no shuffle, no Python). The actual rewrite step a writer runs —
    ``df.repartitionByRange(n_groups, "file_group", "zval")
    .sortWithinPartitions("zval")`` — then gives every output file a tight
    (user, time) bounding box, which is what parquet min/max pruning needs
    to skip files on either predicate dimension at 100 TB.
    """
    assert n_groups & (n_groups - 1) == 0, "n_groups must be a power of two"
    group_bits = n_groups.bit_length() - 1
    src = events.select(
        "event_id",
        F.col("user_id").cast("long").alias("u"),
        # seconds granularity keeps (t-lo)·(2^bits-1) far inside int64
        # (micros × 65535 would overflow at ~14-year spans); an exact
        # integer floor in both engines (div here, // in DuckDB). The NTZ
        # cast is safe: the session TZ is pinned UTC, so the epoch equals
        # DuckDB's naive epoch_us.
        F.expr("unix_micros(cast(ts as timestamp)) div 1000000").alias("t"),
    )
    bounds = src.agg(
        F.min("u").alias("u_lo"),
        F.max("u").alias("u_hi"),
        F.min("t").alias("t_lo"),
        F.max("t").alias("t_hi"),
    )
    top = (1 << bits) - 1
    # exact-integer scale: rebase to corpus-start FIRST, then multiply and
    # integer-divide — `div` is exact int64 floor division (no double pass,
    # so no 2^53 precision cliff), mirrored by DuckDB's `//`
    sx = F.expr(
        f"((u - u_lo) * {top}) div greatest(1, u_hi - u_lo)"
    )
    sy = F.expr(
        f"((t - t_lo) * {top}) div greatest(1, t_hi - t_lo)"
    )
    return (
        src.crossJoin(F.broadcast(bounds))
        .select("event_id", sx.alias("sx"), sy.alias("sy"))
        .select(
            "event_id",
            _interleave(F.col("sx"), F.col("sy"), bits).alias("zval"),
        )
        .select(
            "event_id",
            "zval",
            F.shiftright(F.col("zval"), 2 * bits - group_bits).alias("file_group"),
        )
    )
