"""Posting-list block codec: delta-gap + LEB128 varint, pure numpy.

The reference compresses its bulk payloads with gzip
(out_elasticsearch.rb:1086-1092); the engine's analogue at index level is
this posting-block codec (north_star: "delta-gap + varint (PForDelta-style)
compressed blocks with per-block max-score metadata").

Both encode and decode are vectorized: the only Python-level loops are over
the ≤10 varint byte positions (constant), never over elements. Encode/decode
operate on uint64 numpy arrays and run inside applyInPandas groups, so a
1000-executor build pays C-speed per partition.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # postings per block (classic block-max granularity)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array. Vectorized: builds the (n, 10) byte
    matrix via shifts, masks continuation bits, flattens valid bytes."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # byte length per value: ceil(bit_length / 7), min 1
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 1
        tmp >>= np.uint64(1)
    nbytes = np.maximum((nbits + 6) // 7, 1)

    max_b = int(nbytes.max())
    out = np.zeros((v.size, max_b), dtype=np.uint8)
    rem = v.copy()
    for i in range(max_b):
        out[:, i] = (rem & np.uint64(0x7F)).astype(np.uint8)
        rem >>= np.uint64(7)
    # continuation bit on all but each value's last byte
    cols = np.arange(max_b)
    cont = cols[None, :] < (nbytes[:, None] - 1)
    out[cont] |= 0x80
    valid = cols[None, :] < nbytes[:, None]
    return out[valid].tobytes()


def varint_decode(buf: bytes | bytearray | memoryview, count: int | None = None) -> np.ndarray:
    """Decode LEB128 buffer back to uint64 array. Vectorized via reduceat
    over value boundaries."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    # index of the value each byte belongs to
    starts = np.concatenate([[0], np.nonzero(is_last)[0][:-1] + 1])
    val_idx = np.cumsum(np.concatenate([[0], is_last[:-1].astype(np.int64)]))
    pos_in_val = np.arange(b.size) - starts[val_idx]
    contrib = (b & 0x7F).astype(np.uint64) << (np.uint64(7) * pos_in_val.astype(np.uint64))
    vals = np.bitwise_or.reduceat(contrib, starts)
    if count is not None:
        assert vals.size == count, f"decoded {vals.size} values, expected {count}"
    return vals


def _varint_bytes_matrix(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(byte matrix (n, max_b) with continuation bits set, per-value byte
    counts). Shared by whole-array and segmented encoders."""
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 1
        tmp >>= np.uint64(1)
    nbytes = np.maximum((nbits + 6) // 7, 1)
    max_b = int(nbytes.max())
    out = np.zeros((v.size, max_b), dtype=np.uint8)
    rem = v.copy()
    for i in range(max_b):
        out[:, i] = (rem & np.uint64(0x7F)).astype(np.uint8)
        rem >>= np.uint64(7)
    cols = np.arange(max_b)
    out[cols[None, :] < (nbytes[:, None] - 1)] |= 0x80
    return out, nbytes


def varint_encode_segments(values: np.ndarray, seg_starts: np.ndarray) -> list[bytes]:
    """Encode a concatenation of segments in ONE vectorized pass, returning
    one bytes object per segment. This is what makes per-term posting
    encoding cheap: one numpy pass per applyInPandas group instead of one
    python call per term."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return []
    mat, nbytes = _varint_bytes_matrix(v)
    valid = np.arange(mat.shape[1])[None, :] < nbytes[:, None]
    flat = mat[valid].tobytes()
    ends = np.cumsum(nbytes)
    offsets = np.concatenate([[0], ends])
    seg_bounds = np.append(seg_starts, v.size)
    return [
        flat[offsets[seg_bounds[i]] : offsets[seg_bounds[i + 1]]]
        for i in range(len(seg_starts))
    ]


def delta_gaps_segments(values: np.ndarray, seg_starts: np.ndarray) -> np.ndarray:
    """Per-segment delta gaps (first element of each segment absolute)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    gaps = v.copy()
    gaps[1:] -= v[:-1]
    gaps[seg_starts] = v[seg_starts]
    return gaps


def delta_encode_segments(values: np.ndarray, seg_starts: np.ndarray) -> list[bytes]:
    return varint_encode_segments(delta_gaps_segments(values, seg_starts), seg_starts)


def delta_encode(sorted_ids: np.ndarray) -> bytes:
    """Delta-gap + varint encode a strictly-increasing uint64 id array:
    first value absolute, rest as gaps."""
    ids = np.ascontiguousarray(sorted_ids, dtype=np.uint64)
    if ids.size == 0:
        return b""
    gaps = np.empty_like(ids)
    gaps[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    return varint_encode(gaps)


def delta_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    gaps = varint_decode(buf, count)
    return np.cumsum(gaps, dtype=np.uint64)


def segmented_cumsum(gaps: np.ndarray, seg_starts: np.ndarray, seg_lens: np.ndarray) -> np.ndarray:
    """Reconstruct absolute ids from per-segment delta gaps in one pass:
    global cumsum minus the carried-over prefix at each segment start."""
    acc = np.cumsum(gaps, dtype=np.uint64)
    carry = acc[seg_starts] - gaps[seg_starts]
    return acc - np.repeat(carry, seg_lens)


def encode_blocks(doc_ids: np.ndarray, tfs: np.ndarray, tfns: np.ndarray,
                  block_size: int = BLOCK_SIZE) -> list[dict]:
    """Chunk one (shard, term) posting run — doc_ids strictly increasing —
    into compressed blocks. ``tfns`` is the idf-independent BM25 factor
    (k1+1)*tf/(tf + k1*(1-b+b*dl/avgdl)) per posting; block max_tfn × idf
    gives the block-max WAND upper bound at query time (keeps df/idf out of
    the build shuffle)."""
    blocks = []
    n = doc_ids.size
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        blocks.append(
            {
                "n_docs": int(e - s),
                "first_doc": int(doc_ids[s]),
                "last_doc": int(doc_ids[e - 1]),
                "docs_enc": delta_encode(doc_ids[s:e]),
                "tfs_enc": varint_encode(tfs[s:e]),
                "max_tfn": float(tfns[s:e].max()),
            }
        )
    return blocks


def decode_block(docs_enc: bytes, tfs_enc: bytes, n_docs: int) -> tuple[np.ndarray, np.ndarray]:
    return delta_decode(docs_enc, n_docs), varint_decode(tfs_enc, n_docs)
