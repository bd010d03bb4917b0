"""Posting-list codecs: delta + variable-byte, numpy-vectorized.

Re-expresses the byte-oriented varint codec of the reference's inverted
index [G: lib/ii.c · GRN_B_ENC/GRN_B_DEC] and its skip-block ("chunk_info")
metadata [G: lib/ii.c · chunk_info, buffer_term] — as pure numpy kernels
that run inside Arrow batches (no per-row Python).

Encoding convention: little-endian 7-bit groups, continuation bit (0x80)
set on every byte except the last of a value. Doc ids are stored as deltas
(first value absolute, then strictly-positive gaps); positions per doc the
same way.

Block layout (one parquet row per block; see build.py):
  128 postings per block; per block three varbyte streams (doc deltas,
  tfs, doclens) plus an optional positions stream, and skip metadata
  (``min_doc_id``/``max_doc_id`` — the seek index) and block-max stats
  (``max_tf``, ``min_dl``) from which the query kernel derives
  block-max WAND pruning — strictly stronger than the reference's
  first-rid-only chunk info.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


def vb_nbytes(values: np.ndarray) -> np.ndarray:
    """Varbyte-encoded size in bytes of each value (shared by the block
    slicer in postings.py and the PFor cost model — ONE copy)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = np.ones(len(v), np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        n += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    return n


def vb_encode(values: np.ndarray) -> bytes:
    """Varbyte-encode a uint64-compatible array. Fully vectorized."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if len(v) == 0:
        return b""
    nbytes = vb_nbytes(v)
    total = int(nbytes.sum())
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    j = np.arange(total, dtype=np.int64) - np.repeat(starts, nbytes)
    rep = np.repeat(v, nbytes)
    out = ((rep >> (np.uint64(7) * j.astype(np.uint64))) & np.uint64(0x7F)).astype(np.uint8)
    cont = np.ones(total, bool)
    cont[ends - 1] = False
    out[cont] |= 0x80
    return out.tobytes()


def vb_decode(buf: bytes | bytearray | memoryview) -> np.ndarray:
    """Decode a varbyte stream to uint64. Fully vectorized."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, np.uint64)
    cont = b & 0x80
    if not cont.any():
        # all values < 128 (typical for tf/doclen/position-delta streams)
        # → bytes ARE the values; skip the group arithmetic entirely
        return b.astype(np.uint64)
    last = cont == 0
    ends = np.flatnonzero(last)
    starts = np.concatenate([np.array([0], np.int64), ends[:-1] + 1])
    group_len = ends - starts + 1
    j = np.arange(len(b), dtype=np.int64) - np.repeat(starts, group_len)
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * j.astype(np.uint64))
    return np.add.reduceat(contrib, starts)


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing int64 ids → gaps (first absolute)."""
    ids = np.asarray(sorted_ids, dtype=np.int64)
    return np.diff(ids, prepend=np.int64(0)).astype(np.uint64)


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(deltas.astype(np.int64))


def encode_positions(counts: np.ndarray, flat_positions: np.ndarray) -> bytes:
    """Encode per-doc position lists as one varbyte stream.

    Stream = varbyte([counts..., deltas...]) where deltas are per-doc
    delta-encoded positions (first absolute per doc), concatenated.
    """
    counts = np.asarray(counts, dtype=np.int64)
    flat = np.asarray(flat_positions, dtype=np.int64)
    if len(flat):
        deltas = np.diff(flat, prepend=np.int64(0))
        # reset the delta at each doc's first position to its absolute value
        doc_starts = np.cumsum(counts) - counts
        nz = doc_starts[counts > 0]
        deltas[nz] = flat[nz]
        deltas = deltas.astype(np.uint64)
    else:
        deltas = np.empty(0, np.uint64)
    return vb_encode(np.concatenate([counts.astype(np.uint64), deltas]))


def decode_positions(buf: bytes, n_docs: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of encode_positions → (counts, flat_positions)."""
    vals = vb_decode(buf)
    counts = vals[:n_docs].astype(np.int64)
    deltas = vals[n_docs:].astype(np.int64)
    if len(deltas) == 0:
        return counts, np.empty(0, np.int64)
    return counts, _segmented_cumsum(deltas, counts)


def _segmented_cumsum(deltas: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Per-segment cumulative sum (vectorized): cumsum reset at each
    segment start."""
    if len(deltas) == 0:
        return deltas
    g = np.cumsum(deltas)
    starts = (np.cumsum(counts) - counts)[counts > 0]
    # value of global cumsum just before each segment start
    carry = np.zeros(len(deltas), np.int64)
    carry[starts[1:]] = g[starts[1:] - 1]
    np.maximum.accumulate(carry, out=carry)
    return g - carry


def slice_blocks(n: int, block_size: int = BLOCK_SIZE) -> list[tuple[int, int]]:
    """[(start, end)] slices covering n postings in block_size chunks."""
    return [(i, min(i + block_size, n)) for i in range(0, n, block_size)]


# --------------------------------------------------------------------------
# PForDelta (patched frame-of-reference) — the alternative block codec
# --------------------------------------------------------------------------
#
# Binary packing with patched exceptions, after Zukowski et al. 2006
# (PFOR) / Lemire & Boytsov 2012 (public literature; the reference's own
# codec family is byte-oriented varint [G: lib/ii.c · GRN_B_ENC]).
#
# Status: implemented + property-tested + benchmarked standalone
# (scripts/bench_codec.py → BENCH.md), DELIBERATELY not wired as the
# default block codec: two rounds of kernel benchmarks show decode
# bandwidth is not a bottleneck after block-max pruning (97–99% of
# blocks never decode; phrase worst case 0.05 s at 2M docs), and wiring
# a second on-disk format through every decode site buys bytes, not
# latency, today. The wiring plan if a corpus ever shows decode-bound
# profiles: meta["codec"]="pfor", encode_partition routes the four
# streams here, TermPostings/the pooled kernels dispatch on meta —
# block layout and skip metadata are codec-agnostic already.

def _bit_lengths(v: np.ndarray) -> np.ndarray:
    """Bit length of each uint64 value (0 → 0). Vectorized."""
    bl = np.zeros(len(v), np.int64)
    tmp = v.copy()
    while tmp.any():
        nz = tmp > 0
        bl[nz] += 1
        tmp >>= np.uint64(1)
    return bl


def pfor_encode(values: np.ndarray) -> bytes:
    """PForDelta-encode a uint64 array (≤ BLOCK_SIZE values per call in
    index use, but any length works).

    Layout: varbyte header [n, b, n_exc] ++ bit-packed low ``b`` bits of
    every value (np.packbits, little bit order) ++ varbyte exception
    stream [idx₀, high₀, idx₁, high₁, ...] patching values whose bit
    length exceeds ``b``. ``b`` is chosen to minimize the exact total
    byte size over the value set's distinct bit lengths."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return vb_encode(np.array([0, 0, 0], np.uint64))
    bl = _bit_lengths(v)
    # exact cost per candidate width b (candidates = distinct bit
    # lengths: any other b is dominated by the next lower candidate)
    idx_cost = vb_nbytes(np.arange(n, dtype=np.uint64))
    best_b, best_cost = None, None
    for b in sorted(set(bl.tolist()) | {int(bl.max())}):
        exc = bl > b
        high = v[exc] >> np.uint64(b)
        cost = (n * b + 7) // 8
        if exc.any():
            cost += int(idx_cost[exc].sum())
            cost += int(vb_nbytes(high).sum())
        if best_cost is None or cost < best_cost:
            best_b, best_cost = b, cost
    b = int(best_b)
    exc = bl > b
    n_exc = int(exc.sum())
    header = vb_encode(np.array([n, b, n_exc], np.uint64))
    if b:
        mask = np.uint64((1 << b) - 1)
        low = v & mask
        bits = (
            (low[:, None] >> np.arange(b, dtype=np.uint64)[None, :])
            & np.uint64(1)
        ).astype(np.uint8)
        body = np.packbits(bits.reshape(-1), bitorder="little").tobytes()
    else:
        body = b""
    if n_exc:
        idx = np.flatnonzero(exc).astype(np.uint64)
        high = v[exc] >> np.uint64(b)
        pairs = np.empty(2 * n_exc, np.uint64)
        pairs[0::2] = idx
        pairs[1::2] = high
        exc_buf = vb_encode(pairs)
    else:
        exc_buf = b""
    return header + body + exc_buf


def pfor_decode(buf: bytes) -> np.ndarray:
    """Inverse of pfor_encode → uint64 array."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    # parse the 3-value varbyte header byte-by-byte (tiny)
    vals, pos = [], 0
    for _ in range(3):
        x, shift = 0, 0
        while True:
            byte = int(raw[pos])
            pos += 1
            x |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        vals.append(x)
    n, b, n_exc = vals
    if n == 0:
        return np.empty(0, np.uint64)
    body_bytes = (n * b + 7) // 8
    if b:
        bits = np.unpackbits(
            raw[pos : pos + body_bytes], bitorder="little"
        )[: n * b].reshape(n, b).astype(np.uint64)
        out = (bits << np.arange(b, dtype=np.uint64)[None, :]).sum(
            axis=1, dtype=np.uint64
        )
    else:
        out = np.zeros(n, np.uint64)
    if n_exc:
        pairs = vb_decode(raw[pos + body_bytes :].tobytes())
        idx = pairs[0::2].astype(np.int64)
        high = pairs[1::2]
        out[idx] |= high << np.uint64(b)
    return out



