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
    # 128 values < 2^7 -> width 7 -> 1 + 4 + ceil(128*7/8) = 117 bytes
    a = np.arange(128, dtype=np.uint64)
    buf = codec.encode_block(a)
    assert buf[0] == 7
    assert len(buf) == 1 + 4 + (128 * 7 + 7) // 8


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=200))
def test_property_for_block_roundtrip(xs):
    a = np.array(xs, dtype=np.uint64)
    assert codec.decode_block(codec.encode_block(a)).tolist() == xs
