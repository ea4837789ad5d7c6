"""Posting-list codec: delta + varbyte, numpy-vectorized (no per-element Python).

Layout of one posting blob (all little-endian):

    [u64 n_postings][u64 len_ids][u64 len_tfs][u64 len_dls]
    [varbyte(delta(doc_ids))][varbyte(tfs)][varbyte(dls)]

Header fields are u64 so a mega-hot term (df ~ N) stays encodable past the
u32 ceiling of ~4.3B postings — the design targets 10^12 docs where 'def'
or 'import' can exceed 2^32 occurrences.

Varbyte: 7 payload bits per byte, least-significant group first, MSB set on the
TERMINAL byte of each value (classic v-byte). Encode/decode are O(total_bytes)
numpy array ops — the per-value loop is over byte-position (≤ 10 iterations),
never over values.

Reference analog: the reference stores postings implicitly inside FAISS's
binary index file (/root/reference/dense_retriever/transforms/ann_index.py:103-107);
this codec is the rebuild's explicit, inspectable replacement (north_star:
"delta-encoded, varbyte-compressed postings").
"""

from __future__ import annotations

import struct

import numpy as np

#: On-disk posting-blob format version, stamped into every index's stats.json
#: and checked at load/search/resume time. v1 = u32 header fields (round 1),
#: v2 = u64 header fields (round 2's 10^12-doc headroom). Bumping this is the
#: explicit "incompatible format" signal — without it, a v1 index decoded by
#: v2 code silently reads payload bytes as lengths (round-2 ADVICE).
FORMAT_VERSION = 2

_MAX_BYTES = 10  # 64 bits / 7


def _varbyte_encode_raw(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized v-byte encode → (uint8 buffer, per-value cumulative byte
    ENDS). The ends array lets batch callers encode many concatenated
    streams in ONE pass and split the buffer at value boundaries — v-byte
    is per-value independent, so the split slices are byte-identical to
    encoding each stream separately."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    # bytes needed per value: 1 + how many thresholds 2^(7i) the value reaches
    n = np.ones(v.size, dtype=np.int64)
    for i in range(1, _MAX_BYTES):
        m = v >= np.uint64(1) << np.uint64(7 * i)
        if not m.any():
            break
        n += m.astype(np.int64)
    ends = np.cumsum(n)
    starts = ends - n
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for k in range(_MAX_BYTES):
        mask = n > k
        if not mask.any():
            break
        chunk = (v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        idx = starts[mask] + k
        out[idx] = chunk.astype(np.uint8)
        last = mask & (n == k + 1)
        out[ends[last] - 1] |= 0x80
    return out, ends


def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized v-byte encode of a uint64 array."""
    out, _ = _varbyte_encode_raw(values)
    return out.tobytes()


def varbyte_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Vectorized v-byte decode → uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray)) else buf
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    term = (b & 0x80) != 0
    # group id of each byte: 0-based index of the value it belongs to
    gid = np.zeros(b.size, dtype=np.int64)
    gid[1:] = np.cumsum(term[:-1])
    n_vals = int(term.sum())
    # position of byte within its group
    group_starts = np.flatnonzero(np.r_[True, term[:-1]])
    pos = np.arange(b.size, dtype=np.int64) - group_starts[gid]
    vals = np.zeros(n_vals, dtype=np.uint64)
    payload = (b & np.uint8(0x7F)).astype(np.uint64) << (7 * pos).astype(np.uint64)
    np.add.at(vals, gid, payload)
    return vals


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray) -> bytes:
    """Encode one term's postings. doc_ids must be sorted ascending, unique."""
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    deltas = np.empty_like(doc_ids)
    if doc_ids.size:
        deltas[0] = doc_ids[0]
        np.subtract(doc_ids[1:], doc_ids[:-1], out=deltas[1:])
    ids_b = varbyte_encode(deltas.astype(np.uint64))
    tfs_b = varbyte_encode(np.ascontiguousarray(tfs, dtype=np.uint64))
    dls_b = varbyte_encode(np.ascontiguousarray(dls, dtype=np.uint64))
    header = struct.pack("<QQQQ", doc_ids.size, len(ids_b), len(tfs_b), len(dls_b))
    return header + ids_b + tfs_b + dls_b


HEADER_BYTES = 32  # 4 × u64


def decode_postings(blob: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """→ (doc_ids int64 sorted, tfs int64, dls int64)."""
    n, l1, l2, l3 = struct.unpack_from("<QQQQ", blob, 0)
    o = HEADER_BYTES
    deltas = varbyte_decode(blob[o : o + l1]).astype(np.int64)
    tfs = varbyte_decode(blob[o + l1 : o + l1 + l2]).astype(np.int64)
    dls = varbyte_decode(blob[o + l1 + l2 : o + l1 + l2 + l3]).astype(np.int64)
    doc_ids = np.cumsum(deltas)
    assert doc_ids.size == n and tfs.size == n and dls.size == n
    return doc_ids, tfs, dls


def _read_one_varbyte(b: bytes, offset: int = 0) -> tuple[int, int]:
    """Decode a single v-byte value; returns (value, bytes_consumed)."""
    val = 0
    shift = 0
    i = offset
    while True:
        byte = b[i]
        val |= (byte & 0x7F) << shift
        i += 1
        if byte & 0x80:
            return val, i - offset
        shift += 7


def merge_postings_fast(blobs: list[bytes], last_doc_ids: list[int]) -> bytes:
    """O(bytes) order-preserving merge by BYTE SPLICING.

    ``blobs`` must cover ascending disjoint doc-id ranges (the doc-range
    shard build guarantees this); ``last_doc_ids[i]`` is the max doc id in
    blob i (from the shard row's block_last_doc_id[-1]). Only the FIRST
    v-byte of each subsequent blob's id stream is rewritten (absolute doc id
    -> delta from the previous blob's last); tf and dl streams concatenate
    unchanged. This makes merging a term with df = N a memcpy instead of a
    full decode+re-encode — the hot-term merge skew killer (north_rule).
    """
    if len(blobs) == 1:
        return blobs[0]
    n_total = 0
    ids_parts: list[bytes] = []
    tf_parts: list[bytes] = []
    dl_parts: list[bytes] = []
    prev_last: int | None = None
    for blob, last_id in zip(blobs, last_doc_ids):
        n, l1, l2, l3 = struct.unpack_from("<QQQQ", blob, 0)
        o = HEADER_BYTES
        ids_b = blob[o : o + l1]
        tf_b = blob[o + l1 : o + l1 + l2]
        dl_b = blob[o + l1 + l2 : o + l1 + l2 + l3]
        if prev_last is not None and n > 0:
            first_abs, consumed = _read_one_varbyte(ids_b, 0)
            delta = first_abs - prev_last
            ids_b = (
                varbyte_encode(np.array([delta], dtype=np.uint64))
                + ids_b[consumed:]
            )
        ids_parts.append(ids_b)
        tf_parts.append(tf_b)
        dl_parts.append(dl_b)
        n_total += n
        if n > 0:
            prev_last = int(last_id)
    ids_all = b"".join(ids_parts)
    tf_all = b"".join(tf_parts)
    dl_all = b"".join(dl_parts)
    header = struct.pack("<QQQQ", n_total, len(ids_all), len(tf_all), len(dl_all))
    return header + ids_all + tf_all + dl_all


def rebase_postings(blob: bytes, offset: int) -> bytes:
    """Shift every doc id in a posting blob by ``offset`` — in O(1) work.

    The id stream is delta-encoded with the FIRST value absolute
    (encode_postings: deltas[0] = doc_ids[0]), so a uniform shift touches
    exactly one v-byte group: first_abs += offset; every subsequent delta is
    unchanged. tf and dl streams are untouched. This is what makes
    cross-index merges (index/merge.py) a byte-level copy instead of a
    decode+re-encode of every posting — the same property
    merge_postings_fast exploits for splice merges.
    """
    if offset == 0 or blob is None:
        return blob
    n, l1, l2, l3 = struct.unpack_from("<QQQQ", blob, 0)
    if n == 0:
        return blob
    o = HEADER_BYTES
    first_abs, consumed = _read_one_varbyte(blob, o)
    if first_abs + offset < 0:
        raise ValueError(
            f"rebase would produce negative doc id: {first_abs} + {offset}"
        )
    new_first = varbyte_encode(np.array([first_abs + offset], dtype=np.uint64))
    ids_b = new_first + blob[o + consumed : o + l1]
    header = struct.pack("<QQQQ", n, len(ids_b), l2, l3)
    return header + ids_b + blob[o + l1 :]


def merge_postings(blobs: list[bytes]) -> bytes:
    """Order-preserving merge of sub-postings whose doc-id ranges are disjoint
    and given in ascending-range order (the salted two-phase build guarantees
    this: salt = doc-range bucket). Falls back to a sort if ranges interleave."""
    ids_parts, tf_parts, dl_parts = [], [], []
    for blob in blobs:
        i, t, d = decode_postings(blob)
        ids_parts.append(i)
        tf_parts.append(t)
        dl_parts.append(d)
    ids = np.concatenate(ids_parts) if ids_parts else np.empty(0, np.int64)
    tfs = np.concatenate(tf_parts) if tf_parts else np.empty(0, np.int64)
    dls = np.concatenate(dl_parts) if dl_parts else np.empty(0, np.int64)
    if ids.size > 1 and (np.diff(ids) <= 0).any():
        order = np.argsort(ids, kind="stable")
        ids, tfs, dls = ids[order], tfs[order], dls[order]
    return encode_postings(ids, tfs, dls)


def encode_position_stream(flat_positions: np.ndarray, tfs: np.ndarray) -> bytes:
    """Encode one term's token positions for positional (phrase) indexes.

    ``flat_positions``: per-doc ascending token positions, docs concatenated
    in posting (doc-id) order; ``tfs``: per-doc position counts — exactly the
    tf stream of the same term's posting blob, so the positions blob needs NO
    header of its own: decode splits on the tfs the caller already has.
    Delta-encoded within each doc (first position absolute per doc), v-byte
    packed — the standard positional-postings layout.
    """
    p = np.ascontiguousarray(flat_positions, dtype=np.int64)
    if p.size == 0:
        return b""
    t = np.ascontiguousarray(tfs, dtype=np.int64)
    starts = np.r_[0, np.cumsum(t)[:-1]]
    deltas = np.empty_like(p)
    deltas[1:] = p[1:] - p[:-1]
    deltas[starts] = p[starts]
    return varbyte_encode(deltas.astype(np.uint64))


def decode_position_stream(blob: bytes, tfs: np.ndarray) -> np.ndarray:
    """Inverse of encode_position_stream → flat int64 positions (per-doc
    ascending, docs in posting order; split with ``np.cumsum(tfs)``)."""
    deltas = varbyte_decode(blob).astype(np.int64)
    if deltas.size == 0:
        return deltas
    t = np.ascontiguousarray(tfs, dtype=np.int64)
    c = np.cumsum(deltas)
    starts = np.r_[0, np.cumsum(t)[:-1]]
    # segmented cumsum: subtract, from every element, the running total
    # accumulated BEFORE its doc's first element
    base = np.zeros(t.size, dtype=np.int64)
    base[1:] = c[starts[1:] - 1]
    return c - np.repeat(base, t)


# --- block-max metadata -------------------------------------------------------

BLOCK_SIZE = 128


def block_meta(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-block (last_doc_id, max_tf, min_dl) for block-max pruning.

    The BM25 tf-normalization tfn = tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) is
    monotone increasing in tf and decreasing in dl, so tfn(max_tf, min_dl)
    computed AT QUERY TIME (with the live avgdl) upper-bounds every member of
    the block. Storing the raw (max_tf, min_dl) instead of a precomputed tfn
    makes block metadata independent of collection statistics — the index
    build needs NO global stats pass, and the same index stays valid as the
    collection grows (avgdl drifts) without weakening correctness.
    """
    n = doc_ids.size
    if n == 0:
        return (
            np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64)
        )
    n_blocks = (n + block_size - 1) // block_size
    starts = np.arange(n_blocks, dtype=np.int64) * block_size
    # reduceat handles the short tail block natively — the former
    # pad+reshape implementation allocated three padded copies per call
    # (the dominant cost of the per-term build loop; outputs identical)
    last = np.asarray(doc_ids)[
        np.minimum(starts + block_size, n) - 1
    ]
    max_tf = np.maximum.reduceat(np.asarray(tfs), starts)
    min_dl = np.minimum.reduceat(np.asarray(dls), starts)
    return last.astype(np.int64), max_tf.astype(np.int64), min_dl.astype(np.int64)
