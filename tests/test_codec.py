"""Varint/delta codec round-trips, incl. hypothesis property tests
(SURVEY.md §5 level 4)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_clj_spark import codec


def test_varint_roundtrip_basic():
    a = np.array([0, 1, 127, 128, 300, 2**20, 2**33], dtype=np.uint64)
    assert codec.decode_varints(codec.encode_varints(a)).tolist() == a.tolist()


def test_varint_empty():
    assert codec.encode_varints(np.zeros(0, np.uint64)) == b""
    assert codec.decode_varints(b"").size == 0


def test_varint_single_byte_values_compact():
    a = np.arange(128, dtype=np.uint64)
    assert len(codec.encode_varints(a)) == 128


def test_delta_roundtrip():
    ids = np.array([3, 7, 8, 100, 10**9], dtype=np.int64)
    d = codec.delta_encode(ids)
    assert (d >= 0).all()
    assert codec.delta_decode(d).tolist() == ids.tolist()


def test_positions_roundtrip():
    tfs = np.array([2, 1, 3])
    pos = [np.array([4, 9]), np.array([0]), np.array([1, 2, 50])]
    buf = codec.encode_positions(tfs, pos)
    got = codec.decode_positions(buf, tfs)
    for g, p in zip(got, pos):
        assert g.tolist() == p.tolist()


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=200))
def test_property_varint_roundtrip(xs):
    a = np.array(xs, dtype=np.uint64)
    assert codec.decode_varints(codec.encode_varints(a)).tolist() == xs


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**31), min_size=1, max_size=100,
        unique=True,
    )
)
def test_property_delta_roundtrip(xs):
    ids = np.array(sorted(xs), dtype=np.int64)
    assert codec.delta_decode(codec.delta_encode(ids)).tolist() == ids.tolist()


def test_for_block_roundtrip_basic():
    a = np.array([0, 1, 127, 128, 300, 2**20, 2**31], dtype=np.uint64)
    assert codec.decode_block(codec.encode_block(a)).tolist() == a.tolist()


def test_for_block_empty_and_zeros():
    assert codec.decode_block(codec.encode_block(np.zeros(0, np.uint64))).size == 0
    assert codec.decode_block(b"").size == 0
    z = np.zeros(7, np.uint64)
    assert codec.decode_block(codec.encode_block(z)).tolist() == z.tolist()


def test_for_block_wide_values_fall_back_to_varint():
    a = np.array([2**40, 3, 2**50], dtype=np.uint64)
    buf = codec.encode_block(a)
    assert buf[0] == codec._FOR_VARINT_TAG
    assert codec.decode_block(buf).tolist() == a.tolist()


def test_for_block_width_is_minimal():
    # first value (0) splits into the header; remaining 127 values
    # < 2^7 -> width 7 -> 1 tag + 2 LEB(n=128) + 1 LEB(first=0)
    # + ceil(127*7/8) packed (beats varint's 128)
    a = np.arange(128, dtype=np.uint64)
    buf = codec.encode_block(a)
    assert buf[0] == 7
    assert len(buf) == 1 + 2 + 1 + (127 * 7 + 7) // 8


def test_adaptive_pick_never_worse_than_varint():
    # a wide absolute first value rides in the FOR header (doc-base
    # split), so tiny gaps still pack at 1 bit each
    a = np.concatenate((
        np.array([16000], dtype=np.uint64),
        np.ones(10, dtype=np.uint64),
    ))
    buf = codec.encode_block(a)
    assert buf[0] == 1
    assert codec.decode_block(buf).tolist() == a.tolist()
    # genuinely wide tail values -> varint arm, never worse than
    # varint + 1 tag byte
    b2 = np.array([5, 2**40, 7], dtype=np.uint64)
    vbuf = codec.encode_block(b2)
    assert vbuf[0] == codec._FOR_VARINT_TAG
    assert len(vbuf) == 1 + len(codec.encode_varints(b2))
    assert codec.decode_block(vbuf).tolist() == b2.tolist()
    # dense small gaps: FOR must win (below 1 byte/value)
    b = np.full(128, 3, dtype=np.uint64)
    fbuf = codec.encode_block(b)
    assert fbuf[0] == 2
    assert len(fbuf) < 128
    assert codec.decode_block(fbuf).tolist() == b.tolist()


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=200))
def test_property_for_block_roundtrip(xs):
    a = np.array(xs, dtype=np.uint64)
    assert codec.decode_block(codec.encode_block(a)).tolist() == xs


def test_for_bias_keeps_near_ties_on_the_fast_arm():
    # varint would be marginally smaller here (mostly 1-byte values
    # with an 8-bit FOR width), but the pick biases to FOR unless
    # varint is >=12.5% smaller: a near-tie on bytes must not buy a
    # ~2x decode-time regression on the WAND scan's hottest loop
    a = np.full(128, 200, dtype=np.uint64)  # width 8 = exactly varint
    buf = codec.encode_block(a)
    assert buf[0] == 8  # FOR arm despite byte-parity with varint
    assert codec.decode_block(buf).tolist() == a.tolist()


def test_positions_split_stream_layout():
    # format 4: [len(firsts_block):LEB] + firsts block + gaps block,
    # each independently FOR/varint coded at its own width
    tfs = np.array([3, 2, 4])
    pos = [np.array([1000, 1003, 1006]), np.array([2000, 2002]),
           np.array([500, 501, 502, 503])]
    buf = codec.encode_positions(tfs, pos)
    n_fb, off = codec._read_leb(buf, 0)
    firsts = codec.decode_block(buf[off:off + n_fb])
    gaps = codec.decode_block(buf[off + n_fb:])
    assert firsts.tolist() == [1000, 2000, 500]
    assert gaps.tolist() == [3, 3, 2, 1, 1, 1]
    got = codec.decode_positions(buf, tfs)
    for g, p in zip(got, pos):
        assert g.tolist() == p.tolist()


def test_positions_split_stream_packs_bursty_gaps_narrow():
    # web-page regime: absolute firsts are wide (~12 bits), gaps are
    # narrow (~2 bits). Interleaved they'd all pack at the firsts'
    # width; split, the gaps stream packs at its own width -> the
    # whole point of the layout (44% smaller on web-like blocks)
    tfs = np.full(64, 8, dtype=np.int64)
    pos = [np.arange(8) * 2 + first
           for first in np.arange(64) * 50 + 1000]
    buf = codec.encode_positions(tfs, pos)
    n_fb, off = codec._read_leb(buf, 0)
    gaps_block = buf[off + n_fb:]
    assert gaps_block[0] == 2  # width 2 bits, not the firsts' ~12
    interleaved_floor = 1 + (64 * 8 * 12) // 8  # all at firsts width
    assert len(buf) < interleaved_floor * 0.45
    got = codec.decode_positions(buf, tfs)
    for g, p in zip(got, pos):
        assert g.tolist() == p.tolist()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=10000),
                 min_size=1, max_size=20, unique=True),
        min_size=1, max_size=40,
    )
)
def test_property_positions_roundtrip(groups):
    pos = [np.array(sorted(g), dtype=np.int64) for g in groups]
    tfs = np.array([p.size for p in pos], dtype=np.int64)
    buf = codec.encode_positions(tfs, pos)
    got = codec.decode_positions(buf, tfs)
    assert len(got) == len(pos)
    for g, p in zip(got, pos):
        assert g.tolist() == p.tolist()


def test_pfor_outliers_do_not_widen_the_block():
    # one tf=255 in a block of tf<=3: plain FOR would pack all 127
    # tail values at 8 bits; PFor packs them at 2 bits and patches
    # the single outlier's high bits from the side streams
    a = np.concatenate((
        np.ones(1, dtype=np.uint64),
        np.full(126, 3, dtype=np.uint64),
        np.array([255], dtype=np.uint64),
    ))
    buf = codec.encode_block(a)
    assert buf[0] & codec._PFOR_TAG_BASE  # PFor arm
    assert (buf[0] & 0x3F) == 2           # base width 2, not 8
    plain_for = 1 + 2 + 1 + (127 * 8 + 7) // 8
    assert len(buf) < plain_for * 0.45
    assert codec.decode_block(buf).tolist() == a.tolist()


def test_pfor_many_exceptions_falls_back_to_plain_for():
    # half the values are wide: patching them costs more than just
    # packing at the max width — the cost model must pick plain FOR
    a = np.concatenate((
        np.full(64, 3, dtype=np.uint64),
        np.full(64, 200, dtype=np.uint64),
    ))
    buf = codec.encode_block(a)
    assert not (buf[0] & codec._PFOR_TAG_BASE)
    assert codec.decode_block(buf).tolist() == a.tolist()


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**32 - 1),
             min_size=8, max_size=300),
    st.lists(st.integers(min_value=2**10, max_value=2**31),
             min_size=1, max_size=6),
)
def test_property_pfor_roundtrip_with_outliers(base, outliers):
    a = np.array(base + outliers, dtype=np.uint64)
    assert codec.decode_block(codec.encode_block(a)).tolist() == a.tolist()
