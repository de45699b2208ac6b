"""Spec tests for the Gorilla-style timestamp codec."""

from __future__ import annotations

import pytest

from console_datagen_spark.operators.ts_codec import (
    decode_ts_stream,
    encode_ts_stream,
    varint_len,
)

EPOCH = 1_700_000_000_000_000  # a realistic epoch-us anchor


def test_roundtrip_sweeps():
    cases = [
        [EPOCH],
        [EPOCH, EPOCH],  # zero delta
        [EPOCH, EPOCH + 1],
        [EPOCH + i * 1_000_000 for i in range(500)],  # regular 1 Hz
        [EPOCH, EPOCH + 3, EPOCH + 10, EPOCH + 10, EPOCH + 11],
        [EPOCH - 10**12, EPOCH, EPOCH - 5, EPOCH + 7**13],  # unsorted-ish
        [0, 0, 0],
        [-5, -3, -1],  # negative values survive zigzag
    ]
    for ts in cases:
        assert decode_ts_stream(encode_ts_stream(ts)) == ts


def test_regular_cadence_compresses_hard():
    """The codec's reason to exist: a perfectly regular series stores
    2 varints of real data + 1 byte per remaining sample (dod = 0)."""
    ts = [EPOCH + i * 60_000_000 for i in range(1000)]  # one per minute
    blob = encode_ts_stream(ts)
    # first value ~2^61 zigzagged -> 9 bytes; first delta -> 4; rest 1 each
    assert len(blob) <= 9 + 4 + 999
    assert 8 * len(ts) / len(blob) > 7.5  # >7.5x vs raw int64


def test_byte_length_matches_varint_len_formula():
    """The SQL oracle computes sizes via GREATEST(1,(bitlen+6)//7); the
    encoder's actual bytes must agree value-for-value."""
    vals = [0, 1, -1, 63, 64, -64, -65, 2**20, -(2**41), 2**55, EPOCH]
    for v in vals:
        z = 2 * v if v >= 0 else -2 * v - 1
        # encode a 1-value stream: its length IS the varint length
        assert len(encode_ts_stream([v])) == varint_len(z), v


def test_decode_rejects_malformed():
    good = encode_ts_stream([EPOCH, EPOCH + 5])
    with pytest.raises(ValueError, match="empty"):
        decode_ts_stream(b"")
    with pytest.raises(ValueError, match="empty"):
        encode_ts_stream([])
    with pytest.raises(ValueError, match="truncated"):
        decode_ts_stream(good[:-1] + bytes([good[-1] | 0x80]))
    with pytest.raises(ValueError, match="non-minimal"):
        # 0x80 0x00 encodes 0 in two bytes; minimal is one
        decode_ts_stream(b"\x80\x00")
    with pytest.raises(ValueError, match="longer than 10"):
        decode_ts_stream(b"\xff" * 11)
