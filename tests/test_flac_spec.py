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


# ---- r14 widened surface: LPC, stereo, wasted bits, method 1, width-0 ------

from console_datagen_spark.operators.flac import (  # noqa: E402
    _BitReader,
    _lpc_residual,
    _read_utf8_num,
    _write_utf8_num,
    craft_lpc_stream,
    encode_flac,
)


def test_escape_width_zero_partition():
    """RFC 9639 allows escape width 0 (an all-zero partition); the r13
    decoder crashed on it with a negative shift (ADVICE r13)."""
    # order-1 residuals of a constant tail are all zero
    a = np.concatenate(
        [np.cumsum(np.full(16, 7, dtype=np.int64)), np.full(16, 112, np.int64)]
    )
    b = _craft_stream(
        a, order=1, part_order=1, partition_params=[4, None], escape_width=0
    )
    dec, _ = decode_flac(b)
    assert np.array_equal(dec.astype(np.int64), a)


def test_utf8_frame_number_roundtrip():
    """ADVICE r13: every multi-byte form was undecodable (wrong lead
    byte + wrong capacity loop). Pin the exact boundary values."""
    for v in (127, 128, 2047, 2048, 1 << 20, (1 << 36) - 1):
        w = _BitWriter()
        _write_utf8_num(w, v)
        w.align()
        raw = w.getvalue()
        assert _read_utf8_num(_BitReader(raw)) == v
        # no byte may collide with the 0xFF frame-sync lead
        assert 0xFF not in raw, (v, raw.hex())


def test_utf8_frame_number_in_real_multiframe_stream():
    """Frame numbers >= 128 exercised through actual stream bytes: 130
    frames of 16 samples, decode must verify the full sequence."""
    rng = np.random.default_rng(5)
    a = rng.integers(-2000, 2000, 130 * 16).astype(np.int64)
    dec, _ = decode_flac(encode_flac(a, block_size=16))
    assert np.array_equal(dec.astype(np.int64), a)


def test_lpc_crafted_streams_roundtrip():
    """Decode-side LPC pinned against hand-chosen quantized predictors
    the cost-driven encoder would never pick."""
    rng = np.random.default_rng(11)
    a = np.cumsum(rng.integers(-30, 31, 96)).astype(np.int64)
    cases = [
        ([1024], 10, 12),          # order 1, 0.5x previous
        ([2047, -1023], 10, 12),   # ~2x[i-1] - x[i-2]
        ([15, -7, 3, -1], 4, 5),   # low precision
        ([1] * 32, 5, 12),         # order 32 (max), tiny coefs
        ([512, 256], 0, 12),       # shift 0 (no scaling)
    ]
    for coefs, shift, precision in cases:
        b = craft_lpc_stream(a, coefs, shift=shift, precision=precision)
        dec, _ = decode_flac(b)
        assert np.array_equal(dec.astype(np.int64), a), (coefs, shift)


def test_lpc_negative_shift_rejected():
    """The spec forbids negative predictor shifts; a stream carrying one
    must be rejected, not floor-divided into garbage."""
    a = np.cumsum(np.ones(32, dtype=np.int64) * 3)
    # locate the frame: header(4) + block hdr(4) + streaminfo(34) = 42;
    # frame header through CRC-8 is 4+1+2+2+1 = 10 bytes, subframe header
    # 1 byte, warmup 2 bytes, precision nibble + shift straddle the next
    # bytes. Rather than bit-surgery, craft directly with the writer:
    from console_datagen_spark.operators.flac import _crc16 as crc16
    import hashlib as _hl
    import struct as _st

    si = _BitWriter()
    si.write(4, 16)
    si.write(4, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(16_000, 20)
    si.write(0, 3)
    si.write(15, 5)
    si.write(4, 36)
    samples = np.array([10, 20, 30, 40], dtype=np.int64)
    header = (
        b"fLaC"
        + bytes([0x80, 0, 0, 34])
        + si.getvalue()
        + _hl.md5(samples.astype("<i2").tobytes()).digest()
    )
    fh = _BitWriter()
    fh.write(0b11111111111110, 14)
    fh.write(0, 2)
    fh.write(0b0111, 4)
    fh.write(0b1100, 4)
    fh.write(0, 4)
    fh.write(0b100, 3)
    fh.write(0, 1)
    fh.write(0, 8)
    fh.write(3, 16)
    fh.write(16, 8)
    head = fh.getvalue()
    head += bytes([_crc8(head)])
    body = _BitWriter()
    body.write(0, 1)
    body.write(0b100000, 6)  # LPC order 1
    body.write(0, 1)
    body.write(10 & 0xFFFF, 16)  # warmup
    body.write(11, 4)  # precision 12
    body.write(0b11111, 5)  # shift = -1 (two's complement)
    body.write(1024, 12)
    body.write(0b00, 2)
    body.write(0, 4)
    body.write(4, 4)
    for r in (0, 0, 0):
        body.write_unary(0)
        body.write(0, 4)
    body.align()
    frame = head + body.getvalue()
    frame += _st.pack(">H", crc16(frame))
    with pytest.raises(ValueError, match="negative LPC shift"):
        decode_flac(header + frame)


def test_stereo_all_four_assignments_roundtrip():
    """Each decorrelation decode path pinned via the encoder's
    channel_mode knob; correlated + anti-correlated + extreme inputs."""
    rng = np.random.default_rng(17)
    base = np.cumsum(rng.integers(-50, 51, 128)).astype(np.int64)
    pairs = [
        (base, base + rng.integers(-3, 4, 128)),          # tiny side
        (base, -base),                                    # huge side
        (np.full(64, 32767, np.int64), np.full(64, -32768, np.int64)),
        (rng.integers(-32768, 32768, 64), rng.integers(-32768, 32768, 64)),
    ]
    for left, right in pairs:
        st = np.stack([np.clip(left, -32768, 32767), np.clip(right, -32768, 32767)])
        for mode in ("independent", "left_side", "right_side", "mid_side"):
            enc = encode_flac(st, channel_mode=mode)
            dec, _ = decode_flac(enc)
            assert dec.shape == st.shape
            assert np.array_equal(dec.astype(np.int64), st), mode


def test_stereo_auto_assignment_lossless_and_smaller():
    """Cost-driven assignment: near-duplicate channels must compress
    better than independent, and stay lossless."""
    rng = np.random.default_rng(19)
    left = np.cumsum(rng.integers(-40, 41, 256)).astype(np.int64)
    right = left + rng.integers(-2, 3, 256)
    st = np.stack([left, right])
    auto = encode_flac(st)
    indep = encode_flac(st, channel_mode="independent")
    assert len(auto) < len(indep)
    dec, _ = decode_flac(auto)
    assert np.array_equal(dec.astype(np.int64), st)


def test_wasted_bits_subframe():
    """Wasted-bits decode: samples with k low zero bits are coded at
    bps-k and shifted back up (spec §9.2.2)."""
    import hashlib as _hl
    import struct as _st

    a = (np.cumsum(np.arange(1, 33, dtype=np.int64)) % 4000) << 2  # 2 wasted
    si = _BitWriter()
    si.write(32, 16)
    si.write(32, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(16_000, 20)
    si.write(0, 3)
    si.write(15, 5)
    si.write(32, 36)
    header = (
        b"fLaC"
        + bytes([0x80, 0, 0, 34])
        + si.getvalue()
        + _hl.md5(a.astype("<i2").tobytes()).digest()
    )
    fh = _BitWriter()
    fh.write(0b11111111111110, 14)
    fh.write(0, 2)
    fh.write(0b0111, 4)
    fh.write(0b1100, 4)
    fh.write(0, 4)
    fh.write(0b100, 3)
    fh.write(0, 1)
    fh.write(0, 8)
    fh.write(31, 16)
    fh.write(16, 8)
    head = fh.getvalue()
    head += bytes([_crc8(head)])
    body = _BitWriter()
    shifted = a >> 2
    body.write(0, 1)
    body.write(0b001001, 6)  # FIXED order 1
    body.write(1, 1)  # wasted flag
    body.write_unary(1)  # unary 1 -> wasted = 2
    body.write(int(shifted[0]) & 0x3FFF, 14)  # warmup at bps-2
    res = np.diff(shifted)
    body.write(0b00, 2)
    body.write(0, 4)
    k = 6
    body.write(k, 4)
    for r in res.tolist():
        u = (2 * r) if r >= 0 else (-2 * r - 1)
        body.write_unary(u >> k)
        body.write(u & ((1 << k) - 1), k)
    body.align()
    frame = head + body.getvalue()
    frame += _st.pack(">H", _crc16(frame))
    dec, _ = decode_flac(header + frame)
    assert np.array_equal(dec.astype(np.int64), a)


def test_rice_method_one_five_bit():
    """Residual method 1 (5-bit Rice parameters, escape 0b11111)."""
    import hashlib as _hl
    import struct as _st

    rng = np.random.default_rng(29)
    a = np.cumsum(rng.integers(-2000, 2001, 32)).astype(np.int64)
    a = np.clip(a, -32768, 32767)
    res = np.diff(a)
    si = _BitWriter()
    si.write(32, 16)
    si.write(32, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(16_000, 20)
    si.write(0, 3)
    si.write(15, 5)
    si.write(32, 36)
    header = (
        b"fLaC"
        + bytes([0x80, 0, 0, 34])
        + si.getvalue()
        + _hl.md5(a.astype("<i2").tobytes()).digest()
    )
    fh = _BitWriter()
    fh.write(0b11111111111110, 14)
    fh.write(0, 2)
    fh.write(0b0111, 4)
    fh.write(0b1100, 4)
    fh.write(0, 4)
    fh.write(0b100, 3)
    fh.write(0, 1)
    fh.write(0, 8)
    fh.write(31, 16)
    fh.write(16, 8)
    head = fh.getvalue()
    head += bytes([_crc8(head)])
    body = _BitWriter()
    body.write(0, 1)
    body.write(0b001001, 6)  # FIXED order 1
    body.write(0, 1)
    body.write(int(a[0]) & 0xFFFF, 16)
    body.write(0b01, 2)  # method 1: 5-bit Rice
    body.write(0, 4)
    k = 16  # a parameter only the 5-bit form can express
    body.write(k, 5)
    for r in res.tolist():
        u = (2 * r) if r >= 0 else (-2 * r - 1)
        body.write_unary(u >> k)
        body.write(u & ((1 << k) - 1), k)
    body.align()
    frame = head + body.getvalue()
    frame += _st.pack(">H", _crc16(frame))
    dec, _ = decode_flac(header + frame)
    assert np.array_equal(dec.astype(np.int64), a)


def test_frame_number_sequence_enforced():
    """A fixed-blocksize stream whose second frame repeats frame number 0
    must be rejected (the decoder verifies the sequence)."""
    rng = np.random.default_rng(37)
    a = rng.integers(-1000, 1000, 64).astype(np.int64)
    good = encode_flac(a, block_size=32)
    # both frames are identical-length here only by luck; instead build a
    # broken stream by decoding enforcement: re-encode each half as frame 0
    half = encode_flac(a[:32])
    # splice: header+frame0 from `half`, then frame0 of the SECOND half
    second = encode_flac(a[32:])
    meta_len = 4 + 4 + 34
    frame2 = second[meta_len:]
    si = _BitWriter()
    si.write(32, 16)
    si.write(32, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(16_000, 20)
    si.write(0, 3)
    si.write(15, 5)
    si.write(64, 36)
    import hashlib as _hl

    header = (
        b"fLaC"
        + bytes([0x80, 0, 0, 34])
        + si.getvalue()
        + _hl.md5(a.astype("<i2").tobytes()).digest()
    )
    bad = header + half[meta_len:] + frame2
    with pytest.raises(ValueError, match="out of sequence"):
        decode_flac(bad)
    # the honest multiframe encode of the same samples decodes fine
    dec, _ = decode_flac(good)
    assert np.array_equal(dec.astype(np.int64), a)


def test_lpc_residual_matches_loop_reference():
    """The vectorized np.correlate residual equals the textbook loop."""
    rng = np.random.default_rng(41)
    a = np.cumsum(rng.integers(-500, 501, 64)).astype(np.int64)
    coefs = [700, -300, 150, -50]
    shift = 9
    got = _lpc_residual(a, coefs, shift)
    want = [
        int(a[i])
        - ((sum(coefs[j] * int(a[i - 1 - j]) for j in range(4))) >> shift)
        for i in range(4, len(a))
    ]
    assert got.tolist() == want
