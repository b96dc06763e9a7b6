"""Posting-list physical format: delta-gap + varint, fixed-size blocks,
per-block skip pointers + block-max scores (SURVEY.md §4.2-2; public-domain
techniques — varint/delta coding and block-max metadata per Ding & Suel,
"Faster top-k document retrieval using block-max indexes", SIGIR 2011).

Pure numpy/bytes — runs inside applyInPandas workers; no Spark imports.

Layout per (shard, term): postings sorted by doc_id, split into blocks of
``BLOCK_SIZE``. Per block:
- ``doc_ids_delta_varint``: varint(first_doc), then varint deltas (≥1)
- ``tfs_varint``           : varint per posting
- ``doc_lens_varint``      : varint per posting (needed for BM25 at query time)
- ``positions_blob``       : per posting varint(count) + varint position deltas
- ``skip_doc_id``          : last (max) doc_id in block — the skip pointer
- ``block_max_score``      : max BM25 contribution in block (build-time exact)
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128

BM25_K1 = 1.2
BM25_B = 0.75


# ------------------------------------------------------------------ varint

def varint_encode(values: np.ndarray) -> bytes:
    """LEB128 varint encoding of a uint64 array (numpy-vectorized byte fill)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # byte length per value: number of 7-bit groups (shift loop; np has no clz)
    lengths = np.ones(v.shape, dtype=np.int64)
    tmp = v.copy()
    tmp >>= np.uint64(7)
    while tmp.any():
        lengths += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    total = int(lengths.sum())
    out = np.empty(total, dtype=np.uint8)
    pos = np.zeros(v.shape, dtype=np.int64)
    pos[1:] = np.cumsum(lengths)[:-1]
    rem = v.copy()
    offset = 0
    active = np.ones(v.shape, dtype=bool)
    while active.any():
        byte = (rem & np.uint64(0x7F)).astype(np.uint8)
        rem = rem >> np.uint64(7)
        more = rem > 0
        byte[more] |= 0x80
        out[pos[active] + offset] = byte[active]
        active = active & more
        offset += 1
    return out.tobytes()


def varint_decode(buf: bytes, count: int) -> np.ndarray:
    """Decode ``count`` varints from ``buf`` (numpy scan)."""
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)[:count]
    starts = np.empty(count, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    out = np.zeros(count, dtype=np.uint64)
    max_len = int((ends - starts).max()) + 1
    for k in range(max_len):
        idx = starts + k
        valid = idx <= ends
        vals = (b[idx[valid]] & 0x7F).astype(np.uint64)
        out[valid] |= vals << np.uint64(7 * k)
    return out


# ------------------------------------------------------------------ blocks

def bm25_contrib(tf: np.ndarray, dl: np.ndarray, idf: float, avgdl: float) -> np.ndarray:
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return idf * (tf * (BM25_K1 + 1.0)) / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))


def _positions_stream(plists: list[np.ndarray]) -> np.ndarray:
    """Per-posting ``count, delta_1..delta_count`` stream, fully vectorized
    (the old per-position Python loop dominated the whole segment-encode
    stage — ~10^8 positions walked row-at-a-time at bench scale)."""
    n = len(plists)
    counts = np.fromiter((len(p) for p in plists), count=n, dtype=np.int64)
    total = int(counts.sum())
    stream = np.empty(n + total, dtype=np.uint64)
    starts = np.empty(n, dtype=np.int64)  # flat offset of each list's head
    starts[0] = 0
    np.cumsum(counts[:-1], out=starts[1:])
    if total:
        flat = np.concatenate(plists).astype(np.int64, copy=False)
        d = np.empty_like(flat)
        d[0] = flat[0]
        if flat.size > 1:
            d[1:] = np.diff(flat)
        nz = counts > 0
        d[starts[nz]] = flat[starts[nz]]  # first delta of a list is absolute
    else:
        d = np.empty(0, dtype=np.int64)
    cidx = starts + np.arange(n, dtype=np.int64)  # count slots in the stream
    stream[cidx] = counts.astype(np.uint64)
    mask = np.ones(stream.size, dtype=bool)
    mask[cidx] = False
    stream[mask] = d.astype(np.uint64)
    return stream


def encode_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    doc_lens: np.ndarray,
    positions: list,
    idf: float,
    avgdl: float,
    block_size: int = BLOCK_SIZE,
) -> list[dict]:
    """Postings (sorted by doc_id) → list of block dicts. ``positions``
    accepts any sequence of int sequences (numpy arrays straight out of the
    Arrow batch — no per-element Python conversion needed)."""
    order = np.argsort(doc_ids, kind="stable")
    doc_ids = np.asarray(doc_ids, dtype=np.uint64)[order]
    tfs = np.asarray(tfs, dtype=np.uint64)[order]
    doc_lens = np.asarray(doc_lens, dtype=np.uint64)[order]
    plists = [np.asarray(positions[i], dtype=np.int64) for i in order]

    blocks = []
    for b0 in range(0, len(doc_ids), block_size):
        sl = slice(b0, b0 + block_size)
        ids = doc_ids[sl]
        deltas = np.empty_like(ids)
        deltas[0] = ids[0]
        deltas[1:] = np.diff(ids)
        scores = bm25_contrib(tfs[sl], doc_lens[sl], idf, avgdl)
        blocks.append(
            {
                "block_id": b0 // block_size,
                "n_postings": int(len(ids)),
                "doc_ids_delta_varint": varint_encode(deltas),
                "tfs_varint": varint_encode(tfs[sl]),
                "doc_lens_varint": varint_encode(doc_lens[sl]),
                "positions_blob": varint_encode(_positions_stream(plists[sl])),
                "skip_doc_id": int(ids[-1]),
                "block_max_score": float(scores.max()),
            }
        )
    return blocks


def decode_block(block: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """block → (doc_ids, tfs, doc_lens)."""
    n = int(block["n_postings"])
    deltas = varint_decode(block["doc_ids_delta_varint"], n)
    doc_ids = np.cumsum(deltas.astype(np.int64))
    tfs = varint_decode(block["tfs_varint"], n).astype(np.int64)
    dls = varint_decode(block["doc_lens_varint"], n).astype(np.int64)
    return doc_ids, tfs, dls


def decode_positions(block: dict) -> list[np.ndarray]:
    """block → per-posting absolute position arrays (phrase mode only)."""
    n = int(block["n_postings"])
    # stream: for each posting, count then count deltas — decode greedily
    buf = block["positions_blob"]
    out: list[np.ndarray] = []
    b = np.frombuffer(buf, dtype=np.uint8)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    # decode the full varint stream once, then walk counts
    total_varints = len(ends)
    stream = varint_decode(buf, total_varints).astype(np.int64)
    i = 0
    for _ in range(n):
        cnt = int(stream[i])
        i += 1
        out.append(np.cumsum(stream[i : i + cnt]))
        i += cnt
    return out


# ------------------------------------------------------- FOR / bit-packing

def bitpack_encode(values: np.ndarray) -> bytes:
    """Frame-of-Reference bit-packing (the Lucene PackedInts family, the
    patent-free fixed-width cousin of PForDelta): one header byte carries
    the block's bit width b = bit_length(max value), then every value is
    packed at exactly b bits, little-endian bit order. Decode cost is one
    vectorized unpack — no per-value branching, unlike varint."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return bytes([1])
    b = max(1, int(v.max()).bit_length())
    bits = ((v[:, None] >> np.arange(b, dtype=np.uint64)) & np.uint64(1)).astype(
        np.uint8
    )
    flat = bits.reshape(-1)
    pad = (-flat.size) % 8
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, dtype=np.uint8)])
    return bytes([b]) + np.packbits(flat, bitorder="little").tobytes()


def bitpack_decode(buf: bytes, count: int) -> np.ndarray:
    """Inverse of :func:`bitpack_encode` → uint64 array of ``count`` values."""
    if count == 0:
        return np.array([], dtype=np.uint64)
    b = buf[0]
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8, offset=1), bitorder="little")[
        : count * b
    ]
    vals = bits.reshape(count, b).astype(np.uint64)
    return vals @ (np.uint64(1) << np.arange(b, dtype=np.uint64))
