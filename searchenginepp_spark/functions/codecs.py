"""Posting-list codecs, numpy-vectorized for use inside Arrow/pandas UDFs.

Byte/bit semantics match the reference:
  variable-byte  /root/reference/src/codes/variable_blocks.hpp:242-302
                 little-endian 7-bit groups, MSB=1 on every byte except the
                 last (golden: [0x03,0xEE,0x91,0x04] → [3, 67822])
  unary          /root/reference/src/codes/unary.hpp
                 v ≥ 1 → (v-1) one-bits then a zero bit, packed LSB-first
                 within bytes; trailing pad bits of the final byte decode as
                 spurious values — consumers must stop after n values
                 (documented at src/codes/unary.hpp:55)

Divergence (mandated): the reference varbyte-encodes ABSOLUTE docids
(src/indexBuilder/IndexBuilder.hpp:64); we encode DELTA-GAPS then varbyte,
per the north rule.  Encoding is bijective so scores/ranks are unaffected.
"""

from __future__ import annotations

import numpy as np

_THRESHOLDS = (np.uint64(1) << (7 * np.arange(1, 10, dtype=np.uint64))).astype(np.uint64)


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a uint64 array as a concatenated variable-byte stream."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    lengths = np.searchsorted(_THRESHOLDS, v, side="right").astype(np.int64) + 1
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    out = np.zeros(int(lengths.sum()), dtype=np.uint8)
    max_len = int(lengths.max())
    for k in range(max_len):
        mask = lengths > k
        byte = ((v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (lengths[mask] - 1 > k).astype(np.uint8) << 7  # MSB=1 unless last
        out[starts[mask] + k] = byte | cont
    return out.tobytes()


def varbyte_decode(data: bytes, count: int | None = None) -> np.ndarray:
    """Decode a variable-byte stream to uint64 values."""
    b = np.frombuffer(data, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    n = int(is_last.sum())
    # group id of each byte = number of completed values before it
    group = np.concatenate(([0], np.cumsum(is_last)[:-1]))
    starts = np.concatenate(([0], np.flatnonzero(is_last)[:-1] + 1))
    within = np.arange(b.size, dtype=np.int64) - starts[group]
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * within.astype(np.uint64)
    )
    values = np.add.reduceat(contrib, starts)
    if count is not None:
        values = values[:count]
        n = count
    assert values.size == n
    return values.astype(np.uint64)


def varbyte_value_offsets(values: np.ndarray) -> np.ndarray:
    """Byte offset of each value's first byte within the encoded stream
    (used for skip pointers)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    lengths = np.searchsorted(_THRESHOLDS, v, side="right").astype(np.int64) + 1
    return np.concatenate(([0], np.cumsum(lengths)[:-1]))


def unary_encode(values: np.ndarray) -> bytes:
    """Encode positive ints: v → (v-1) ones then a zero, LSB-first bits."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    if v.size == 0:
        return b""
    if (v < 1).any():
        raise ValueError("unary code requires values >= 1")
    total_bits = int(v.sum())
    bits = np.ones(total_bits, dtype=np.uint8)
    bits[np.cumsum(v) - 1] = 0  # terminator zero per value
    return np.packbits(bits, bitorder="little").tobytes()


def unary_decode(data: bytes, count: int, bit_offset: int = 0) -> np.ndarray:
    """Decode `count` unary values starting at `bit_offset`.

    Trailing pad bits (ones) past the last terminator are ignored because we
    stop after `count` values — mirroring the reference contract that length
    comes from the lexicon's df, not the stream.
    """
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8), bitorder="little")
    bits = bits[bit_offset:]
    zeros = np.flatnonzero(bits == 0)
    if zeros.size < count:
        raise ValueError(f"unary stream exhausted: wanted {count}, found {zeros.size}")
    z = zeros[:count]
    return (np.diff(np.concatenate(([-1], z)))).astype(np.uint64)


def unary_value_bit_offsets(values: np.ndarray) -> np.ndarray:
    """Bit offset of each value's first bit within the encoded stream."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    return np.concatenate(([0], np.cumsum(v)[:-1]))


def delta_encode(docids: np.ndarray) -> np.ndarray:
    """Strictly-increasing docids → gaps (first gap = first docid)."""
    d = np.ascontiguousarray(docids, dtype=np.uint64)
    if d.size == 0:
        return d
    gaps = np.empty_like(d)
    gaps[0] = d[0]
    np.subtract(d[1:], d[:-1], out=gaps[1:])
    if d.size > 1 and (gaps[1:] == 0).any():
        raise ValueError("docids must be strictly increasing")
    return gaps


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.ascontiguousarray(gaps, dtype=np.uint64), dtype=np.uint64)


def encode_posting_list(docids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """(sorted docids, tfs) → (delta+varbyte docid blob, unary tf blob)."""
    return varbyte_encode(delta_encode(docids)), unary_encode(tfs)


def decode_posting_list(docid_blob: bytes, tf_blob: bytes, df: int) -> tuple[np.ndarray, np.ndarray]:
    docids = delta_decode(varbyte_decode(docid_blob, count=df))
    tfs = unary_decode(tf_blob, count=df)
    return docids, tfs
