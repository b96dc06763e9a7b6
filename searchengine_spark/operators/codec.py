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

def varint_encode_ex(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128 varint encoding of a uint64 array (numpy-vectorized byte
    fill). Returns (byte_array, per-value byte lengths) — the lengths let a
    batch encoder slice one whole-column encoding into per-block blobs
    without re-encoding per group."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
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
    return out, lengths


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128 varint encoding of a uint64 array (numpy-vectorized byte fill)."""
    out, _ = varint_encode_ex(values)
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


def encode_blocks_batch(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    doc_lens: np.ndarray,
    plists: list,
    idf_row: np.ndarray,
    avgdl: float,
    group_change: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> dict:
    """Encode MANY (shard, term) posting groups in one vectorized pass.

    The per-group ``encode_blocks`` path pays fixed pandas/numpy overhead
    per call — on a realistic Zipf vocabulary most groups hold 1-3 postings,
    so a 5k-doc corpus produced 250k calls and the encode stage ran ~30×
    slower than the byte volume justifies. Here every column of the whole
    sorted batch is varint-encoded ONCE (``varint_encode_ex`` returns
    per-value byte lengths) and the single byte stream is sliced at block
    boundaries — zero per-group Python work beyond two slice indices.

    Inputs are the batch rows sorted by (group, doc_id); ``group_change``
    is a bool array, True where row i starts a new (shard, term) group
    (row 0 must be True). ``idf_row`` is the per-ROW idf (BM25 contribution
    is linear in idf, so the batch score pass multiplies it in).

    Returns a dict of per-BLOCK columns: ``row_start`` (the batch row index
    of the block's first posting — the caller maps it to shard/term/bucket),
    ``block_id``, ``n_postings``, ``doc_ids_delta_varint``, ``tfs_varint``,
    ``doc_lens_varint``, ``positions_blob``, ``skip_doc_id``,
    ``block_max_score``. Byte-identical to per-group ``encode_blocks``
    (asserted by tests/test_segments.py and every segment-served gate)."""
    n = len(doc_ids)
    if n == 0:
        return {
            "row_start": np.empty(0, dtype=np.int64),
            "block_id": np.empty(0, dtype=np.int32),
            "n_postings": np.empty(0, dtype=np.int32),
            "doc_ids_delta_varint": [],
            "tfs_varint": [],
            "doc_lens_varint": [],
            "positions_blob": [],
            "skip_doc_id": np.empty(0, dtype=np.int64),
            "block_max_score": np.empty(0, dtype=np.float64),
        }
    ids = np.asarray(doc_ids, dtype=np.uint64)
    tfs = np.asarray(tfs, dtype=np.uint64)
    dls = np.asarray(doc_lens, dtype=np.uint64)

    # block boundaries: a new block every `block_size` rows within a group
    gs = np.flatnonzero(group_change)               # group start rows
    counts = np.diff(np.r_[gs, n])                  # rows per group
    rank = np.arange(n, dtype=np.int64) - np.repeat(gs, counts)
    block_of_row = rank // block_size
    bstart = group_change.copy()
    bstart[1:] |= block_of_row[1:] != block_of_row[:-1]
    bs = np.flatnonzero(bstart)                     # block start rows
    be = np.r_[bs[1:], n]                           # block end rows (excl)

    # per-block delta-gap doc ids: diff everywhere, absolute at block heads
    # (cross-boundary diffs may wrap in uint64 — overwritten right after)
    d = np.empty(n, dtype=np.uint64)
    d[1:] = ids[1:] - ids[:-1]
    d[bs] = ids[bs]

    def enc_split(vals: np.ndarray) -> list[bytes]:
        buf, lens = varint_encode_ex(vals)
        off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=off[1:])
        bb = buf.tobytes()
        return [bb[off[s] : off[e]] for s, e in zip(bs, be)]

    id_bytes = enc_split(d)
    tf_bytes = enc_split(tfs)
    dl_bytes = enc_split(dls)

    # positions: one stream for the whole batch (count, delta_1..delta_c per
    # posting), sliced at block boundaries via per-slot byte offsets
    pcounts = np.fromiter((len(p) for p in plists), count=n, dtype=np.int64)
    stream = _positions_stream(plists)
    sbuf, slens = varint_encode_ex(stream)
    soff = np.zeros(stream.size + 1, dtype=np.int64)
    np.cumsum(slens, out=soff[1:])
    # posting i occupies stream slots [slot0[i], slot0[i] + pcounts[i]]
    slot0 = np.zeros(n, dtype=np.int64)
    np.cumsum(pcounts[:-1], out=slot0[1:])
    slot0 += np.arange(n, dtype=np.int64)
    slot_end = slot0 + pcounts + 1                  # exclusive
    sbb = sbuf.tobytes()
    pos_bytes = [sbb[soff[slot0[s]] : soff[slot_end[e - 1]]] for s, e in zip(bs, be)]

    # bit-identical to bm25_contrib's scalar-idf evaluation order
    # ((idf*x)/y — NOT (x/y)*idf, which differs in the last ulp)
    tf_f = tfs.astype(np.float64)
    dl_f = dls.astype(np.float64)
    scores = (np.asarray(idf_row, dtype=np.float64) * (tf_f * (BM25_K1 + 1.0))) / (
        tf_f + BM25_K1 * (1.0 - BM25_B + BM25_B * dl_f / avgdl)
    )
    return {
        "row_start": bs,
        "block_id": block_of_row[bs].astype(np.int32),
        "n_postings": (be - bs).astype(np.int32),
        "doc_ids_delta_varint": id_bytes,
        "tfs_varint": tf_bytes,
        "doc_lens_varint": dl_bytes,
        "positions_blob": pos_bytes,
        "skip_doc_id": ids[be - 1].astype(np.int64),
        "block_max_score": np.maximum.reduceat(scores, bs),
    }


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
