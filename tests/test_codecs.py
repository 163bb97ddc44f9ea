"""Codec goldens ported from the reference unit tests
(/root/reference/tests/test_codes_variable_blocks.cpp,
 /root/reference/tests/test_codes_unary.cpp,
 /root/reference/tests/test_index_builder.cpp) plus property tests."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from searchenginepp_spark.functions.codecs import (
    decode_posting_list,
    delta_decode,
    delta_encode,
    encode_posting_list,
    unary_decode,
    unary_encode,
    unary_value_bit_offsets,
    varbyte_decode,
    varbyte_encode,
    varbyte_value_offsets,
)


def test_varbyte_golden_decode():
    # test_codes_variable_blocks.cpp:5-16
    data = bytes([0x03, 0xEE, 0x91, 0x04])
    assert varbyte_decode(data).tolist() == [3, 67822]


def test_varbyte_sizes():
    # test_codes_variable_blocks.cpp:44-57
    assert len(varbyte_encode(np.array([10]))) == 1
    assert len(varbyte_encode(np.array([1000]))) == 2
    assert len(varbyte_encode(np.array([10**6]))) == 3
    assert varbyte_encode(np.array([0])) == b"\x00"


def test_varbyte_roundtrip_golden():
    # test_codes_variable_blocks.cpp:18-42
    vals = [10, 100, 1000, 10000, 0xCAFEBABE, 12345, 0xDEADBEEF, 0xDEADBEEF]
    enc = varbyte_encode(np.array(vals, dtype=np.uint64))
    assert varbyte_decode(enc).tolist() == vals


def test_unary_golden_decode():
    # test_codes_unary.cpp:4-35 — LSB-first bit packing
    data = bytes([0b00000011, 0b01101110, 0b10010001, 0b01110101])
    expected = [3, 1, 1, 1, 1, 1, 1, 4, 3, 2, 1, 1, 2, 1, 3, 2, 4]
    assert unary_decode(data, count=len(expected)).tolist() == expected


def test_unary_golden_encode():
    expected = [3, 1, 1, 1, 1, 1, 1, 4, 3, 2, 1, 1, 2, 1, 3, 2, 4]
    enc = unary_encode(np.array(expected))
    assert list(enc) == [0b00000011, 0b01101110, 0b10010001, 0b01110101]


def test_unary_roundtrip_golden():
    # test_codes_unary.cpp:59-83
    vals = [10, 20, 10, 1, 1, 1, 1, 8, 23, 1, 5, 1, 1]
    enc = unary_encode(np.array(vals))
    assert unary_decode(enc, count=len(vals)).tolist() == vals


def test_unary_bit_offset_decode():
    vals = [3, 1, 4, 2]
    enc = unary_encode(np.array(vals))
    offs = unary_value_bit_offsets(np.array(vals))
    assert offs.tolist() == [0, 3, 4, 8]
    for i, off in enumerate(offs):
        assert unary_decode(enc, count=1, bit_offset=int(off))[0] == vals[i]


def test_index_builder_golden():
    # test_index_builder.cpp:6-31: term "banano" @ (1,1),(2,2),(3,1).
    # Reference (absolute docids): stream \x01\x02\x03. With our mandated
    # delta-gap the gaps are 1,1,1 → \x01\x01\x01. Freqs 1,2,1 unary →
    # bits 0,10,0 = 0b00000010.
    docids = np.array([1, 2, 3], dtype=np.uint64)
    tfs = np.array([1, 2, 1])
    dblob, fblob = encode_posting_list(docids, tfs)
    assert dblob == b"\x01\x01\x01"
    assert fblob == bytes([0b00000010])
    d2, f2 = decode_posting_list(dblob, fblob, df=3)
    assert d2.tolist() == [1, 2, 3]
    assert f2.tolist() == [1, 2, 1]


def test_varbyte_value_offsets():
    vals = np.array([10, 1000, 10**6, 3], dtype=np.uint64)
    offs = varbyte_value_offsets(vals)
    assert offs.tolist() == [0, 1, 3, 6]
    enc = varbyte_encode(vals)
    # decoding from each offset yields the suffix
    for i, off in enumerate(offs):
        assert varbyte_decode(enc[int(off):])[0] == vals[i]


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
@settings(max_examples=50, deadline=None)
def test_varbyte_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert varbyte_decode(varbyte_encode(arr)).tolist() == vals


@given(st.lists(st.integers(min_value=1, max_value=500), max_size=200))
@settings(max_examples=50, deadline=None)
def test_unary_roundtrip_property(vals):
    arr = np.array(vals)
    assert unary_decode(unary_encode(arr), count=len(vals)).tolist() == vals


@given(
    st.lists(st.integers(min_value=1, max_value=2**40), min_size=1,
             max_size=300, unique=True)
)
@settings(max_examples=50, deadline=None)
def test_posting_list_roundtrip_property(docids):
    docids = np.array(sorted(docids), dtype=np.uint64)
    tfs = (docids % 7 + 1).astype(np.int64)
    dblob, fblob = encode_posting_list(docids, tfs)
    d2, f2 = decode_posting_list(dblob, fblob, df=len(docids))
    assert d2.tolist() == docids.tolist()
    assert f2.tolist() == tfs.tolist()


def test_delta_roundtrip():
    d = np.array([5, 6, 100, 101, 10**9], dtype=np.uint64)
    assert delta_decode(delta_encode(d)).tolist() == d.tolist()
