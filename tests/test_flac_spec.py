"""FLAC decoder spec branches the repo's encoder never emits.

The encoder always writes partition order 0 with plain Rice parameters,
so decode support for partition orders > 0 and for the escape code
(0b1111 -> fixed-width verbatim residuals) would otherwise be dead
code. These tests hand-craft spec-conformant streams with the writer
primitives and assert the decoder reconstructs the exact samples —
pinning the claim that the decoder handles the full residual-coding
method-0 surface, not just its own encoder's output."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from console_datagen_spark.operators.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _fixed_residual,
    decode_flac,
)


def _craft_stream(
    samples: np.ndarray,
    order: int,
    part_order: int,
    partition_params: list[int | None],
    escape_width: int = 18,
    rate: int = 16_000,
) -> bytes:
    """Build a single-frame mono 16-bit FLAC stream with a FIXED
    subframe of ``order`` and Rice partition order ``part_order``.
    ``partition_params[i]`` is the Rice k for partition i, or None for
    the escape (verbatim residuals at ``escape_width`` bits)."""
    a = np.asarray(samples, dtype=np.int64)
    n = len(a)
    assert n % (1 << part_order) == 0, "blocksize must split evenly"
    res = _fixed_residual(a, order).tolist()

    si = _BitWriter()
    si.write(n, 16)
    si.write(n, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(0, 3)
    si.write(15, 5)
    si.write(n, 36)
    streaminfo = si.getvalue() + hashlib.md5(
        a.astype("<i2").tobytes()
    ).digest()
    header = b"fLaC" + bytes([0x80, 0, 0, 34]) + streaminfo

    fh = _BitWriter()
    fh.write(0b11111111111110, 14)
    fh.write(0, 2)
    fh.write(0b0111, 4)  # 16-bit blocksize-1 at header end
    fh.write(0b1100, 4)  # 8-bit kHz rate
    fh.write(0, 4)  # mono
    fh.write(0b100, 3)  # 16-bit samples
    fh.write(0, 1)
    fh.write(0, 8)  # frame number 0 (UTF-8 single byte)
    fh.write(n - 1, 16)
    fh.write(rate // 1000, 8)
    head = fh.getvalue()
    head += bytes([_crc8(head)])

    body = _BitWriter()
    body.write(0, 1)
    body.write(0b001000 | order, 6)  # FIXED
    body.write(0, 1)
    for v in a[:order].tolist():
        body.write(int(v) & 0xFFFF, 16)
    body.write(0b00, 2)  # method 0 (4-bit Rice)
    body.write(part_order, 4)
    pos = 0
    for p, k in enumerate(partition_params):
        cnt = (n >> part_order) - (order if p == 0 else 0)
        chunk = res[pos : pos + cnt]
        pos += cnt
        if k is None:
            body.write(0b1111, 4)  # escape
            body.write(escape_width, 5)
            for r in chunk:
                body.write(int(r) & ((1 << escape_width) - 1), escape_width)
        else:
            body.write(k, 4)
            for r in chunk:
                u = (2 * r) if r >= 0 else (-2 * r - 1)
                body.write_unary(u >> k)
                if k:
                    body.write(u & ((1 << k) - 1), k)
    assert pos == len(res)
    body.align()
    frame = head + body.getvalue()
    frame += struct.pack(">H", _crc16(frame))
    return header + frame


def test_partition_order_two_rice():
    """4 partitions, distinct Rice parameters, order-1 predictor."""
    rng = np.random.default_rng(23)
    a = np.cumsum(rng.integers(-40, 41, 64)).astype(np.int64)
    b = _craft_stream(a, order=1, part_order=2, partition_params=[2, 5, 3, 7])
    dec, rate = decode_flac(b)
    assert rate == 16_000
    assert np.array_equal(dec.astype(np.int64), a)


def test_escape_coded_partition():
    """Escape (0b1111) partitions carry fixed-width two's-complement
    residuals; mix them with Rice partitions in one subframe."""
    rng = np.random.default_rng(31)
    a = np.cumsum(rng.integers(-100, 101, 32)).astype(np.int64)
    b = _craft_stream(a, order=1, part_order=1, partition_params=[4, None])
    dec, _ = decode_flac(b)
    assert np.array_equal(dec.astype(np.int64), a)


def test_escape_negative_residuals_roundtrip():
    """Escape decoding must sign-extend: descending ramp -> all-negative
    order-1 residuals."""
    a = np.arange(0, -640, -20, dtype=np.int64)  # 32 samples
    b = _craft_stream(a, order=1, part_order=1, partition_params=[None, None])
    dec, _ = decode_flac(b)
    assert np.array_equal(dec.astype(np.int64), a)


def test_crafted_stream_crc_still_enforced():
    a = np.cumsum(np.ones(32, dtype=np.int64))
    b = bytearray(
        _craft_stream(a, order=1, part_order=1, partition_params=[3, 3])
    )
    b[-1] ^= 0x01
    with pytest.raises(ValueError, match="CRC-16"):
        decode_flac(bytes(b))
