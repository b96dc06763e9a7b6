"""Deterministic random-hyperplane constants for LSH (no pyspark imports —
shared by the Spark operators, the numpy kernels, and the DuckDB oracle SQL
builders).

Plane component i of plane p is an **integer** derived from md5(f"{p}:{i}"):
the first 6 hex chars (24 bits) mapped to ±2^24 via ``2*h - 2^24``. Working
in integers makes the sign of <quantized_vec, plane> exact and identical in
Spark (Catalyst or numpy) and DuckDB — an LSH bucket assignment that can be
hash-gated, not just eyeballed.

Overflow headroom: |component| ≤ 2^24, |quantized coord| ≤ ~2^31 for any
sane embedding scale, 64 dims → |dot| ≤ 2^61 < int64 max.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache


@lru_cache(maxsize=None)
def plane_ints(n_planes: int, dim: int) -> tuple[tuple[int, ...], ...]:
    """n_planes × dim integer plane components (deterministic, engine-free)."""
    out = []
    for p in range(n_planes):
        comps = []
        for i in range(dim):
            h = int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:6], 16)
            comps.append(2 * h - (1 << 24))
        out.append(tuple(comps))
    return tuple(out)
