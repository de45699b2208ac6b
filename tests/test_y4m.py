"""Y4M container (operators/y4m.py): round-trip, header dialects,
loud rejection. The cross-engine certification of mm_video_y4m is
pinned by test_oracle.py; these pin the container layer."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from console_datagen_spark.operators.y4m import (
    decode_y4m,
    encode_y4m,
    sample_every,
)


@given(
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_roundtrip_any_geometry(n, h, w, seed):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, (n, h, w)).astype(np.uint8)
    dec, fps = decode_y4m(encode_y4m(frames, fps=(30, 1)))
    assert fps == (30, 1)
    assert np.array_equal(dec, frames)


def test_sample_every_matches_slicing():
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (9, 4, 4)).astype(np.uint8)
    assert np.array_equal(sample_every(frames, 3), frames[::3])


def test_parses_c420_and_c444_headers():
    """Foreign-producer streams with chroma planes: luma comes back,
    chroma is validated for size and skipped."""
    h, w = 4, 6
    luma = np.arange(h * w, dtype=np.uint8).reshape(h, w)
    for ctag, div in (("420", 4), ("444", 1)):
        chroma = bytes(2 * (h * w // div))
        payload = (
            f"YUV4MPEG2 W{w} H{h} F24:1 Ip A1:1 C{ctag} Xsome=ext\n".encode()
            + b"FRAME\n"
            + luma.tobytes()
            + chroma
            + b"FRAME\n"
            + luma.tobytes()
            + chroma
        )
        dec, fps = decode_y4m(payload)
        assert fps == (24, 1)
        assert dec.shape == (2, h, w)
        assert np.array_equal(dec[0], luma)


def test_default_chroma_is_c420():
    """Per spec, a header without a C tag means 4:2:0."""
    h = w = 2
    luma = np.full((h, w), 7, dtype=np.uint8)
    payload = (
        f"YUV4MPEG2 W{w} H{h} F25:1\n".encode()
        + b"FRAME\n"
        + luma.tobytes()
        + bytes(2 * (h * w // 4))
    )
    dec, _ = decode_y4m(payload)
    assert np.array_equal(dec[0], luma)


def test_rejects_garbage_loudly():
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        decode_y4m(b"RIFF....WAVE")
    good = encode_y4m(np.zeros((2, 2, 2), dtype=np.uint8))
    with pytest.raises(ValueError, match="FRAME"):
        decode_y4m(good.replace(b"FRAME", b"FRAMX", 1))
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(good[:-1])
    with pytest.raises(ValueError, match="unknown Y4M header tag"):
        decode_y4m(b"YUV4MPEG2 W2 H2 Q9\nFRAME\n" + bytes(4))


def test_c420_odd_dimensions_ceil_halved_planes():
    """VERDICT r13 #4: real 4:2:0 chroma planes are ceil(w/2)*ceil(h/2)
    each; 5x5 C420 frames carry 2*3*3 = 18 chroma bytes, not
    2*(25//4) = 12. Parse must frame correctly, not drift."""
    h = w = 5
    rng = np.random.default_rng(9)
    lumas = [
        rng.integers(0, 256, (h, w)).astype(np.uint8) for _ in range(2)
    ]
    chroma = bytes(2 * 3 * 3)
    payload = f"YUV4MPEG2 W{w} H{h} F24:1 Ip A1:1 C420\n".encode()
    for luma in lumas:
        payload += b"FRAME\n" + luma.tobytes() + chroma
    dec, _ = decode_y4m(payload)
    assert dec.shape == (2, h, w)
    assert np.array_equal(dec[0], lumas[0])
    assert np.array_equal(dec[1], lumas[1])
    # the OLD (floor-quarter) sizing would leave trailing bytes and the
    # second marker misaligned: prove the stream is consumed exactly
    with pytest.raises(ValueError):
        decode_y4m(payload + b"x")


def test_frame_marker_must_be_delimited():
    """ADVICE r13: b'FRAMExyz' is not a FRAME marker — the 6th byte must
    be newline or the space that starts frame parameters."""
    luma = np.zeros((2, 2), dtype=np.uint8)
    good = (
        b"YUV4MPEG2 W2 H2 F24:1 Ip A1:1 Cmono\n"
        + b"FRAME\n"
        + luma.tobytes()
    )
    assert decode_y4m(good)[0].shape == (1, 2, 2)
    # frame parameters after a space are legal per spec
    spaced = good.replace(b"FRAME\n", b"FRAME Xtag\n")
    assert decode_y4m(spaced)[0].shape == (1, 2, 2)
    for bad_marker in (b"FRAMES\n", b"FRAMExyz\n", b"FRAM\n"):
        bad = (
            b"YUV4MPEG2 W2 H2 F24:1 Ip A1:1 Cmono\n"
            + bad_marker
            + luma.tobytes()
        )
        with pytest.raises(ValueError, match="FRAME marker"):
            decode_y4m(bad)
