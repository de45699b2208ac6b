"""FLAC codec (operators/flac.py) — round-trip, compression, and
verification-failure properties. The cross-engine certification of the
mm_audio_flac query is pinned by test_oracle.py; these tests pin the
codec layer so a regression names the layer, not just the query."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from console_datagen_spark.operators.flac import (
    _crc8,
    _crc16,
    decode_flac,
    encode_flac,
)


def _roundtrip(samples: np.ndarray, rate: int = 16_000) -> bytes:
    b = encode_flac(samples, rate)
    dec, got_rate = decode_flac(b)
    assert got_rate == rate
    assert np.array_equal(dec.astype(np.int64), samples.astype(np.int64))
    return b


@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=300
    )
)
@settings(max_examples=60, deadline=None)
def test_roundtrip_any_int16(vals):
    _roundtrip(np.array(vals, dtype=np.int16))


def test_roundtrip_edge_patterns():
    rng = np.random.default_rng(11)
    for s in [
        np.zeros(96, dtype=np.int16),
        np.full(96, -32768, dtype=np.int16),
        np.full(96, 32767, dtype=np.int16),
        (np.arange(96) * 100 - 4000).astype(np.int16),  # linear ramp
        np.array([32767, -32768] * 48, dtype=np.int16),  # max residuals
        rng.integers(-32768, 32768, 4096).astype(np.int16),
        np.array([7], dtype=np.int16),
    ]:
        _roundtrip(s)


def test_compresses_smooth_signals():
    """The point of a FLAC path vs WAV: small fixed-predictor residuals
    Rice-code far below 16 bits/sample."""
    rng = np.random.default_rng(3)
    smooth = np.cumsum(rng.integers(-3, 4, 2000)).astype(np.int16)
    b = encode_flac(smooth)
    wav_bytes = 44 + 2 * len(smooth)
    assert len(b) < wav_bytes * 0.45, (len(b), wav_bytes)


def test_md5_chain_payload_matches_wav_samples():
    """synth_flac_media and synth_wav_media must decode to the SAME
    samples (the shared oracle replay depends on it)."""
    from console_datagen_spark.operators.wav import decode_wav, encode_wav

    def chain(doc_id: int, n: int) -> bytes:
        out = b""
        i = 0
        while len(out) < n:
            out += hashlib.md5(f"{doc_id}:{i}".encode()).digest()
            i += 1
        return out[:n]

    for doc_id in (0, 17, 123):
        samples = np.frombuffer(chain(doc_id, 192), dtype="<i2")
        f, fr = decode_flac(encode_flac(samples))
        w, wr = decode_wav(encode_wav(samples))
        assert fr == wr == 16_000
        assert np.array_equal(f, w)


@pytest.mark.parametrize("flip_at", ["header", "subframe", "crc16"])
def test_corruption_is_loud(flip_at):
    rng = np.random.default_rng(5)
    b = bytearray(encode_flac(rng.integers(-100, 100, 96).astype(np.int16)))
    pos = {"header": 45, "subframe": len(b) - 8, "crc16": len(b) - 1}[flip_at]
    b[pos] ^= 0x55
    with pytest.raises(ValueError):
        decode_flac(bytes(b))


def test_rejects_unsupported_loudly():
    with pytest.raises(ValueError):
        decode_flac(b"RIFF....WAVE")  # not FLAC
    with pytest.raises(ValueError):
        encode_flac(np.array([40000], dtype=np.int64))  # out of int16
    with pytest.raises(ValueError):
        encode_flac(np.zeros(0, dtype=np.int16))  # empty


def test_crc_vectors():
    """Spec polynomials: CRC-8 (x^8+x^2+x+1) and CRC-16 (x^16+x^15+x^2+1)
    against independently computed vectors."""
    assert _crc8(b"") == 0
    assert _crc8(b"\x00") == 0
    assert _crc8(b"123456789") == 0xF4  # standard CRC-8/ATM check value
    assert _crc16(b"123456789") == 0xFEE8  # standard CRC-16/BUYPASS value


def test_rate_encodings():
    """8-bit-kHz, 16-bit-Hz, and 16-bit-10Hz header rate paths."""
    s = np.arange(32, dtype=np.int16)
    for rate in (16_000, 44_100, 22_050, 96_000, 327_680):
        b = encode_flac(s, rate)
        dec, got = decode_flac(b)
        assert got == rate and np.array_equal(dec, s)
