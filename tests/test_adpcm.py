"""IMA-ADPCM codec spec tests (operators/adpcm.py).

The certified query (mm_audio_adpcm) replays the encode+decode recursion
in SQL; these tests pin the codec itself: state-walk equivalence against
an independent step-by-step reference, container validation, multi-block
and short-final-block behavior, and int16/step-index clamping at the
extremes.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from console_datagen_spark.operators.adpcm import (
    INDEX_DELTA,
    STEP_TABLE,
    decode_ima_adpcm,
    encode_ima_adpcm,
)


def ref_reconstruction(x: np.ndarray, samples_per_block: int = 97) -> np.ndarray:
    """Independent encode+decode walk (written against the IMA spec text,
    not by importing the module's helpers)."""
    out = []
    idx = 0
    pos = 0
    x = x.astype(np.int64)
    while pos < len(x):
        pred = int(x[pos])
        out.append(pred)
        for xi in x[pos + 1 : pos + samples_per_block]:
            step = STEP_TABLE[idx]
            diff = int(xi) - pred
            sign = diff < 0
            mag = -diff if sign else diff
            code = 0
            if mag >= step:
                code |= 4
                mag -= step
            if mag >= step >> 1:
                code |= 2
                mag -= step >> 1
            if mag >= step >> 2:
                code |= 1
            d = step >> 3
            if code & 4:
                d += step
            if code & 2:
                d += step >> 1
            if code & 1:
                d += step >> 2
            pred = pred - d if sign else pred + d
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + INDEX_DELTA[code]))
            out.append(pred)
        pos += samples_per_block
    return np.array(out, dtype=np.int16)


def test_roundtrip_matches_reference_walk():
    rng = np.random.default_rng(7)
    x = rng.integers(-32768, 32768, size=194).astype(np.int16)
    recon, rate = decode_ima_adpcm(encode_ima_adpcm(x, 16_000))
    assert rate == 16_000
    assert np.array_equal(recon, ref_reconstruction(x))


def test_smooth_signal_reconstruction_is_close():
    # ADPCM is built for smooth signals: a slow ramp reconstructs within
    # the smallest step sizes once the quantizer locks on.
    x = (np.arange(97) * 3).astype(np.int16)
    recon, _ = decode_ima_adpcm(encode_ima_adpcm(x))
    assert np.abs(recon.astype(int) - x.astype(int))[10:].max() <= 8


def test_lossy_but_deterministic():
    rng = np.random.default_rng(11)
    x = rng.integers(-32768, 32768, size=97).astype(np.int16)
    enc1 = encode_ima_adpcm(x)
    enc2 = encode_ima_adpcm(x)
    assert enc1 == enc2
    recon, _ = decode_ima_adpcm(enc1)
    assert not np.array_equal(recon, x)  # lossy...
    recon2, _ = decode_ima_adpcm(enc1)
    assert np.array_equal(recon, recon2)  # ...but replay-exact


def test_multi_block_state_carryover():
    # Step index carries ACROSS blocks; block headers reset pred only.
    rng = np.random.default_rng(3)
    x = rng.integers(-32768, 32768, size=3 * 97).astype(np.int16)
    recon, _ = decode_ima_adpcm(encode_ima_adpcm(x))
    assert len(recon) == 3 * 97
    assert np.array_equal(recon, ref_reconstruction(x))
    # header samples are verbatim
    assert recon[0] == x[0] and recon[97] == x[97] and recon[194] == x[194]


def test_short_final_block_fact_strips_padding():
    x = np.arange(100, dtype=np.int16)  # 97 + 3: final block is short
    content = encode_ima_adpcm(x)
    recon, _ = decode_ima_adpcm(content)
    assert len(recon) == 100
    assert np.array_equal(recon, ref_reconstruction(x))


def test_clamp_extremes():
    # Full-scale square wave forces int16 clamps and drives the step
    # index to both rails.
    x = np.tile([32767, -32768], 49)[:97].astype(np.int16)
    recon, _ = decode_ima_adpcm(encode_ima_adpcm(x))
    assert recon.max() <= 32767 and recon.min() >= -32768
    assert np.array_equal(recon, ref_reconstruction(x))


def test_container_shape_and_nbytes():
    x = np.zeros(194, dtype=np.int16)
    content = encode_ima_adpcm(x, samples_per_block=97)
    assert len(content) == 164  # the oracle's fixed framing certificate
    assert content[:4] == b"RIFF" and content[8:12] == b"WAVE"
    # fmt tag 0x11, mono, 4-bit
    fmt_off = content.index(b"fmt ") + 8
    tag, n_ch = struct.unpack("<HH", content[fmt_off : fmt_off + 4])
    assert tag == 0x11 and n_ch == 1


def test_rejects_bad_containers():
    x = np.zeros(97, dtype=np.int16)
    good = encode_ima_adpcm(x)
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        decode_ima_adpcm(b"JUNK" + good[4:])
    # PCM (tag 1) payloads must be rejected by the ADPCM decoder
    from console_datagen_spark.operators.wav import encode_wav

    with pytest.raises(ValueError, match="format tag"):
        decode_ima_adpcm(encode_wav(x))
    # fact chunk is required
    no_fact = good.replace(b"fact", b"junk")
    with pytest.raises(ValueError, match="fact"):
        decode_ima_adpcm(no_fact)
    # block header: step index > 88
    data_off = good.index(b"data") + 8
    bad_idx = bytearray(good)
    bad_idx[data_off + 2] = 89
    with pytest.raises(ValueError, match="step index"):
        decode_ima_adpcm(bytes(bad_idx))
    # block header: nonzero reserved byte
    bad_res = bytearray(good)
    bad_res[data_off + 3] = 1
    with pytest.raises(ValueError, match="reserved"):
        decode_ima_adpcm(bytes(bad_res))


def test_encoder_rejects_bad_inputs():
    with pytest.raises(ValueError, match="mono"):
        encode_ima_adpcm(np.zeros((4, 2), dtype=np.int16))
    with pytest.raises(ValueError, match="8k"):
        encode_ima_adpcm(np.zeros(10, dtype=np.int16), samples_per_block=10)
    with pytest.raises(ValueError, match="empty"):
        encode_ima_adpcm(np.zeros(0, dtype=np.int16))
    with pytest.raises(ValueError, match="int16"):
        encode_ima_adpcm(np.array([40000]))


def test_truncated_containers_raise_loud_valueerrors():
    x = np.zeros(97, dtype=np.int16)
    good = encode_ima_adpcm(x)
    # a well-formed chunk list whose fmt body is too short for the
    # 16-byte base header -> loud ValueError, not struct.error
    short_fmt = (
        b"RIFF" + (4 + 8 + 10 + 8).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (10).to_bytes(4, "little") + b"\x00" * 10
        + b"data" + (0).to_bytes(4, "little")
    )
    with pytest.raises(ValueError, match="truncated fmt"):
        decode_ima_adpcm(short_fmt)
    # a data chunk cut mid-block-header
    data_at = good.index(b"data")
    with pytest.raises(ValueError, match="truncated ADPCM block"):
        decode_ima_adpcm(
            good[: data_at + 4]
            + (3).to_bytes(4, "little")
            + good[data_at + 8 : data_at + 11]
        )
    # derailing the chunk walk (bad declared fmt length) must still
    # surface as a ValueError, whatever the walk concludes
    bad = bytearray(good)
    bad[good.index(b"fmt ") + 4] = 10
    with pytest.raises(ValueError):
        decode_ima_adpcm(bytes(bad))


def test_adpcm_property_roundtrip_matches_reference():
    """Hypothesis sweep: any int16 signal, any legal block size — the
    codec's reconstruction must equal the independent reference walk."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=100, deadline=None)
    @given(st.data())
    def check(data):
        spb = data.draw(st.sampled_from([9, 17, 97]))
        n = data.draw(st.integers(min_value=1, max_value=3 * spb + 5))
        x = np.array(
            data.draw(
                st.lists(
                    st.integers(min_value=-32768, max_value=32767),
                    min_size=n,
                    max_size=n,
                )
            ),
            dtype=np.int16,
        )
        recon, _ = decode_ima_adpcm(
            encode_ima_adpcm(x, samples_per_block=spb)
        )
        assert np.array_equal(recon, ref_reconstruction(x, spb))

    check()
