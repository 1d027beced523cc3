"""Posting-block codec — vectorized FOR bit-packing + varint + delta.

The north-star index layout stores postings as compressed blocks of
~128 docs (Lucene's block size), per block: delta-coded doc ids,
term frequencies, per-posting norm bytes, and concatenated
delta-coded positions — plus ``block_max_score`` metadata for
block-max WAND skipping (SURVEY.md §4.2).

Two codecs, both numpy-vectorized (no per-value Python loops):

- ``encode_block``/``decode_block`` — the segment-format-4 block
  codec: adaptive FOR (frame-of-reference) fixed-width bit-packing,
  the same family Lucene's ``ForUtil`` uses per 128-doc postings
  block. A one-byte width tag + LEB128 count + LEB128 first value
  (Lucene's doc-base split: the block's leading absolute offset
  rides in the header so it can't force the shared width up), then
  ``(n-1)*width`` bits packed LSB-first via ``np.packbits``/
  ``np.unpackbits`` (C-speed). Each buffer is encoded as whichever
  of FOR / varint is smaller — tag 0 marks the varint arm (sparse
  or tiny blocks, the position stream's per-posting absolute
  resets, and any value wider than 32 bits). Measured vs the varint
  codec on realistic block shapes: ~2.6x faster decode, ~3.5x
  faster encode, ~1.2-1.4x smaller (BENCH/BASELINE.md round-4
  codec section).
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
    """Adaptively encode a non-negative int array (segment format 4):
    FOR bit-packing when it is smaller, varint otherwise.

    FOR layout: ``[width:1][n:LEB128][first:LEB128]`` + ``n-1``
    values packed at ``width`` bits LSB-first — the codec family
    Lucene's ``ForUtil`` uses per postings block, with the block's
    first value split into the header (Lucene's doc-base trick)
    because a delta block starts with an ABSOLUTE in-chunk offset
    that would otherwise force the whole block's width up. Varint
    layout: ``[0x00]`` + LEB128 payload; chosen only when it is
    >= 12.5% smaller than the FOR arm (tiny/sparse blocks), and
    always for values wider than 32 bits. The bias exists because
    FOR decodes ~2-3x faster per block (one ``unpackbits`` +
    matmul) than the varint boundary-scan — a near-tie on bytes
    should not buy a 2x decode-time regression on the WAND scan's
    hottest loop."""
    a = np.ascontiguousarray(a, dtype=np.uint64)
    if a.size == 0:
        return bytes([_FOR_VARINT_TAG])
    if a.size > 1:
        rest = a[1:]
        w = max(1, int(rest.max()).bit_length())
        if w <= _FOR_MAX_WIDTH:
            head = _leb(int(a.size)) + _leb(int(a[0]))
            for_len = 1 + len(head) + ((a.size - 1) * w + 7) // 8
            # FOR unless varint is >=12.5% smaller (7/8 = the bias);
            # a.size is varint's exact lower bound (>=1 byte/value),
            # so dense blocks skip the _varint_len pass entirely
            if (for_len * 7 <= a.size * 8
                    or for_len * 7 <= _varint_len(a) * 8):
                bits = ((rest[:, None] >> np.arange(w, dtype=np.uint64))
                        & np.uint64(1))
                packed = np.packbits(bits.astype(np.uint8).ravel(),
                                     bitorder="little")
                return bytes([w]) + head + packed.tobytes()
    return bytes([_FOR_VARINT_TAG]) + encode_varints(a)


def _varint_len(a: np.ndarray) -> int:
    """Exact LEB128-encoded byte length of ``a`` without building it."""
    nb = np.ones(a.shape, dtype=np.int64)
    v = a >> np.uint64(7)
    while v.any():
        nb += (v > 0).astype(np.int64)
        v >>= np.uint64(7)
    return int(nb.sum())


def _leb(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def decode_block(buf: bytes) -> np.ndarray:
    """Inverse of ``encode_block`` -> uint64 array (vectorized)."""
    if len(buf) == 0:
        return np.zeros(0, dtype=np.uint64)
    w = buf[0]
    if w == _FOR_VARINT_TAG:
        return decode_varints(buf[1:])
    n, off = _read_leb(buf, 1)
    first, off = _read_leb(buf, off)
    bits = np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8, offset=off),
        count=(n - 1) * w, bitorder="little",
    ).reshape(n - 1, w)
    out = np.empty(n, dtype=np.uint64)
    out[0] = first
    np.matmul(bits.astype(np.uint64), _BIT_WEIGHTS[:w], out=out[1:])
    return out


def _read_leb(buf: bytes, off: int) -> tuple[int, int]:
    n = 0
    shift = 0
    while True:
        b = buf[off]
        off += 1
        n |= (b & 0x7F) << shift
        if not (b & 0x80):
            return n, off
        shift += 7


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
    python list of per-posting arrays.

    Layout (format 4): ``[len(firsts_block):LEB128]`` + two
    ``encode_block`` payloads — the per-posting ABSOLUTE first
    positions, then the flat intra-posting gaps. Splitting the two
    populations lets each pack at its own FOR width (firsts ~11-13
    bits, gaps ~2-6 bits); interleaved (the format-3 layout) the
    absolute resets forced every gap up to the firsts' width, and
    the adaptive codec would flee to the slower varint arm. Measured
    (tools-free micro A/B, BENCH/BASELINE.md round-4 codec section):
    on web-page-like blocks (128 postings, avg tf 10, bursty gaps)
    the split stream is 44% smaller than interleaved FOR at ~1.3x
    its decode pass (both linear unpackbits); on short-doc blocks
    (tf mostly 1, the gaps stream near-empty) it is size-neutral
    (-0.8%). Positions dominate index bytes on web corpora, so the
    long-doc regime is the one that matters at scale."""
    if flat.size == 0:
        return b""
    flat = np.ascontiguousarray(flat, dtype=np.int64)
    counts = np.asarray(tfs, dtype=np.int64)
    p_starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    deltas = np.empty_like(flat)
    deltas[0] = flat[0]
    np.subtract(flat[1:], flat[:-1], out=deltas[1:])
    firsts = flat[p_starts]
    gap_mask = np.ones(flat.size, dtype=bool)
    gap_mask[p_starts] = False
    fb = encode_block(firsts.astype(np.uint64))
    gb = encode_block(deltas[gap_mask].astype(np.uint64))
    return _leb(len(fb)) + fb + gb


def decode_positions_flat(
    buf: bytes, tfs: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of encode_positions WITHOUT splitting: returns
    ``(flat, starts)`` where posting ``j``'s positions are
    ``flat[starts[j] : starts[j] + tfs[j]]``. Vectorized: decode the
    firsts and gaps blocks, scatter them back into one delta stream
    (absolutes at posting boundaries), then one cumsum with a
    per-posting offset correction (the cumsum carries the previous
    postings' totals across boundaries). The flat form feeds the
    phrase kernels' vectorized multi-segment gather;
    ``decode_positions`` wraps it with zero-copy splits."""
    counts = np.asarray(tfs, dtype=np.int64)
    if len(buf) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, (np.zeros(counts.size, dtype=np.int64)
                   if counts.size == 0 else
                   np.concatenate(([0], np.cumsum(counts)[:-1])))
    n_fb, off = _read_leb(buf, 0)
    firsts = decode_block(buf[off:off + n_fb]).astype(np.int64)
    gaps = decode_block(buf[off + n_fb:]).astype(np.int64)
    if counts.size == 0:
        return gaps[:0], np.zeros(0, dtype=np.int64)
    p_starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    total = firsts.size + gaps.size
    if total == 0:
        return gaps[:0], p_starts
    deltas = np.empty(total, dtype=np.int64)
    gap_mask = np.ones(total, dtype=bool)
    gap_mask[p_starts] = False
    deltas[p_starts] = firsts
    deltas[gap_mask] = gaps
    starts = p_starts[1:]
    c = np.cumsum(deltas)
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
