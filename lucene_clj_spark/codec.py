"""Posting-block codec — vectorized FOR bit-packing + varint + delta.

The north-star index layout stores postings as compressed blocks of
~128 docs (Lucene's block size), per block: delta-coded doc ids,
term frequencies, per-posting norm bytes, and concatenated
delta-coded positions — plus ``block_max_score`` metadata for
block-max WAND skipping (SURVEY.md §4.2).

Two codecs, both numpy-vectorized (no per-value Python loops):

- ``encode_block``/``decode_block`` — the segment-format-3 block
  codec: FOR (frame-of-reference) fixed-width bit-packing, the same
  family Lucene's ``ForUtil`` uses per 128-doc postings block. A
  one-byte width tag + 4-byte count header, then ``n*width`` bits
  packed LSB-first via ``np.packbits``/``np.unpackbits`` (C-speed).
  Values needing more than 32 bits fall back to the varint payload
  under tag 0. Measured vs the varint codec on realistic block
  shapes: ~2.6x faster decode, ~3.5x faster encode, ~1.2-1.4x
  smaller (see BENCH/BASELINE.md round-4 codec section).
- ``encode_varints``/``decode_varints`` — LEB128, kept as the tag-0
  fallback and for non-block metadata: encode builds the byte stream
  with masked passes; decode finds value boundaries from continuation
  bits and reduces 7-bit groups with ``np.add.reduceat``.

These kernels run inside Arrow UDFs on executors — the hot path of
both index build and WAND scoring.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


def encode_varints(a: np.ndarray) -> bytes:
    """LEB128-encode a non-negative int array (vectorized)."""
    a = np.ascontiguousarray(a, dtype=np.uint64)
    if a.size == 0:
        return b""
    nb = np.ones(a.shape, dtype=np.int64)
    v = a >> np.uint64(7)
    while v.any():
        nb += (v > 0).astype(np.int64)
        v >>= np.uint64(7)
    starts = np.concatenate(([0], np.cumsum(nb)[:-1]))
    buf = np.zeros(int(nb.sum()), dtype=np.uint8)
    kmax = int(nb.max())
    for k in range(kmax):
        m = nb > k
        byte = ((a[m] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nb[m] - 1) > k
        buf[starts[m] + k] = byte | (cont.astype(np.uint8) << 7)
    return buf.tobytes()


def decode_varints(buf: bytes) -> np.ndarray:
    """Inverse of encode_varints -> uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    # group id per byte: 0-based index of the value this byte belongs to
    group = np.zeros(b.size, dtype=np.int64)
    group[1:] = np.cumsum(is_end)[:-1]
    starts = np.flatnonzero(np.diff(np.concatenate(([-1], group))) > 0)
    pos_in_group = np.arange(b.size) - starts[group]
    contrib = (b & 0x7F).astype(np.uint64) << (7 * pos_in_group).astype(
        np.uint64
    )
    return np.add.reduceat(contrib, starts)


_FOR_VARINT_TAG = 0
_FOR_MAX_WIDTH = 32
_BIT_WEIGHTS = np.uint64(1) << np.arange(_FOR_MAX_WIDTH, dtype=np.uint64)


def encode_block(a: np.ndarray) -> bytes:
    """FOR bit-pack a non-negative int array (segment format 3).

    Layout: ``[width:1][n:4 LE][ceil(n*width/8) packed bytes]``,
    bits LSB-first within the stream. ``width == 0`` tags a raw
    varint payload (empty arrays, or any value wider than 32 bits —
    impossible for in-chunk doc deltas/tfs/position deltas, kept as
    a safety hatch)."""
    a = np.ascontiguousarray(a, dtype=np.uint64)
    if a.size == 0:
        return bytes([_FOR_VARINT_TAG])
    w = max(1, int(a.max()).bit_length())
    if w > _FOR_MAX_WIDTH:
        return bytes([_FOR_VARINT_TAG]) + encode_varints(a)
    bits = ((a[:, None] >> np.arange(w, dtype=np.uint64)) & np.uint64(1))
    packed = np.packbits(bits.astype(np.uint8).ravel(), bitorder="little")
    return (bytes([w]) + int(a.size).to_bytes(4, "little")
            + packed.tobytes())


def decode_block(buf: bytes) -> np.ndarray:
    """Inverse of ``encode_block`` -> uint64 array (vectorized)."""
    if len(buf) == 0:
        return np.zeros(0, dtype=np.uint64)
    w = buf[0]
    if w == _FOR_VARINT_TAG:
        return decode_varints(buf[1:])
    n = int.from_bytes(buf[1:5], "little")
    bits = np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8, offset=5),
        count=n * w, bitorder="little",
    ).reshape(n, w)
    return bits.astype(np.uint64) @ _BIT_WEIGHTS[:w]


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing ids -> first value + gaps (all >= 0)."""
    a = np.ascontiguousarray(sorted_ids, dtype=np.int64)
    out = np.empty_like(a)
    if a.size:
        out[0] = a[0]
        np.subtract(a[1:], a[:-1], out=out[1:])
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(np.ascontiguousarray(deltas, dtype=np.int64))


def encode_positions(tfs: np.ndarray, positions: list[np.ndarray]) -> bytes:
    """Concatenate per-posting position lists, each delta-coded, into
    one varint stream; ``tfs`` gives the per-posting counts needed to
    split at decode time. One flat pass: deltas across the whole
    concatenation with a reset at each posting boundary — no per-
    posting numpy calls (this is the index build's hottest loop)."""
    if len(positions) == 0:
        return b""
    flat = np.concatenate([np.asarray(p, dtype=np.int64) for p in positions])
    return encode_positions_flat(tfs, flat)


def encode_positions_flat(tfs: np.ndarray, flat: np.ndarray) -> bytes:
    """``encode_positions`` over an ALREADY-flat position stream —
    the zero-copy entry used by the slab encoder, which slices the
    Arrow list column's values buffer directly instead of building a
    python list of per-posting arrays."""
    if flat.size == 0:
        return b""
    flat = np.ascontiguousarray(flat, dtype=np.int64)
    counts = np.asarray(tfs, dtype=np.int64)
    deltas = np.empty_like(flat)
    deltas[0] = flat[0]
    np.subtract(flat[1:], flat[:-1], out=deltas[1:])
    starts = np.cumsum(counts)[:-1]
    deltas[starts] = flat[starts]  # boundary reset: absolute first pos
    return encode_block(deltas)


def decode_positions_flat(
    buf: bytes, tfs: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of encode_positions WITHOUT splitting: returns
    ``(flat, starts)`` where posting ``j``'s positions are
    ``flat[starts[j] : starts[j] + tfs[j]]``. Vectorized: one cumsum
    over the flat stream, then a per-posting offset correction (the
    cumsum carries the previous postings' totals across boundaries).
    The flat form feeds the phrase kernels' vectorized multi-segment
    gather; ``decode_positions`` wraps it with zero-copy splits."""
    flat = decode_block(buf).astype(np.int64)
    counts = np.asarray(tfs, dtype=np.int64)
    if counts.size == 0:
        return flat[:0], np.zeros(0, dtype=np.int64)
    p_starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    if flat.size == 0:
        return flat, p_starts
    starts = p_starts[1:]
    c = np.cumsum(flat)
    # subtract each posting's incoming running total (c[start-1]) so
    # every split behaves like its own cumsum
    run_off = np.concatenate(([0], c[starts - 1]))
    adj = c - np.repeat(run_off, counts)
    return adj, p_starts


def decode_positions(buf: bytes, tfs: np.ndarray) -> list[np.ndarray]:
    """Inverse of encode_positions -> per-posting position arrays."""
    counts = np.asarray(tfs, dtype=np.int64)
    adj, p_starts = decode_positions_flat(buf, tfs)
    if adj.size == 0:
        return [np.zeros(0, dtype=np.int64) for _ in range(counts.size)]
    return np.split(adj, p_starts[1:])
