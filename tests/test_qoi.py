"""Spec tests for the QOI codec (crafted streams + property sweeps)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from console_datagen_spark.operators.qoi import decode_qoi, encode_qoi

END = b"\x00" * 7 + b"\x01"


def _header(w, h, ch=3, cs=0):
    return b"qoif" + struct.pack(">IIBB", w, h, ch, cs)


def test_hand_decoded_stream_all_ops():
    """A hand-assembled stream exercising RGB, DIFF, LUMA, RUN and INDEX
    decodes to exactly the pixels computed on paper."""
    stream = (
        _header(7, 1)
        + bytes((0xFE, 100, 150, 200))  # RGB -> (100,150,200)
        + bytes((0x40 | (3 << 4) | (0 << 2) | 2,))  # DIFF +1,-2,0 -> (101,148,200)
        + bytes((0x80 | (10 + 32), ((3 + 8) << 4) | (8 - 8)))
        # LUMA dg=+10, dr=dg+3=13, db=dg-8=2 -> (114,158,202)
        + bytes((0xC0 | 1,))  # RUN 2 -> same pixel twice
        + bytes((0xFE, 100, 150, 200))  # back to first colour... via RGB
        + bytes(((100 * 3 + 150 * 5 + 200 * 7 + 255 * 11) % 64,))  # INDEX hit
        + END
    )
    arr, meta = decode_qoi(stream)
    want = np.array(
        [
            [100, 150, 200],
            [101, 148, 200],
            [114, 158, 202],
            [114, 158, 202],
            [114, 158, 202],
            [100, 150, 200],
            [100, 150, 200],
        ],
        dtype=np.uint8,
    ).reshape(1, 7, 3)
    assert np.array_equal(arr, want)
    assert meta["ops"] == {
        "rgb": 2,
        "diff": 1,
        "luma": 1,
        "run": 1,
        "index": 1,
        "rgba": 0,
    }


def test_roundtrip_structured_and_random():
    rng = np.random.RandomState(7)
    imgs = [
        rng.randint(0, 256, (13, 9, 3)).astype(np.uint8),
        rng.randint(0, 256, (5, 5, 4)).astype(np.uint8),
        np.zeros((4, 70, 3), dtype=np.uint8),  # long runs crossing 62
        np.tile(
            np.array([[10, 20, 30], [10, 21, 31]], dtype=np.uint8), (8, 4, 1)
        ),
    ]
    # gradient: consecutive small deltas -> DIFF/LUMA heavy
    g = np.cumsum(rng.randint(-2, 2, (1, 300, 3)), axis=1) % 256
    imgs.append(g.astype(np.uint8))
    for img in imgs:
        out, meta = decode_qoi(encode_qoi(img))
        assert np.array_equal(out, img)
        assert (meta["width"], meta["height"]) == (img.shape[1], img.shape[0])


def test_encoder_uses_every_op():
    """One structured image drives all six chunk types (the op histogram
    is the proof the priority ladder is live, not just the RGB path)."""
    px = []
    cur = np.array([100, 100, 100], dtype=np.int64)
    palette = [(200, 10, 10), (10, 200, 10), (10, 10, 200)]
    for i in range(400):
        if i % 25 == 0:
            cur = np.array(palette[(i // 25) % 3], dtype=np.int64)
        elif i % 7 == 0:
            pass  # repeat -> RUN
        elif i % 11 == 0:
            cur = (cur + np.array([12, 10, 5])) % 256  # LUMA range
        else:
            cur = (cur + np.array([1, -1, 1])) % 256  # DIFF range
        px.append(cur.copy())
    img = np.array(px, dtype=np.uint8).reshape(20, 20, 3)
    data = encode_qoi(img)
    out, meta = decode_qoi(data)
    assert np.array_equal(out, img)
    ops = meta["ops"]
    for op in ("run", "index", "diff", "luma", "rgb"):
        assert ops[op] > 0, (op, ops)
    # and RGBA appears once alpha actually changes
    rgba = np.dstack([img, np.full((20, 20), 255, np.uint8)])
    rgba[3, 3, 3] = 7
    data4 = encode_qoi(rgba)
    out4, meta4 = decode_qoi(data4)
    assert np.array_equal(out4, rgba)
    assert meta4["ops"]["rgba"] > 0


def test_diff_wraparound():
    img = np.array([[[255, 0, 128], [0, 255, 127]]], dtype=np.uint8)
    data = encode_qoi(img)
    out, meta = decode_qoi(data)
    assert np.array_equal(out, img)
    # 255->0 is dr=+1, 0->255 dg=-1, 128->127 db=-1: a single DIFF byte
    assert meta["ops"]["diff"] == 1


def test_run_length_62_boundary():
    img = np.zeros((1, 63, 3), dtype=np.uint8)
    img[0, 0] = (9, 9, 9)
    data = encode_qoi(np.tile(img[0, 0], (1, 63, 1)).astype(np.uint8))
    out, meta = decode_qoi(data)
    # first pixel RGB, then 62 identical: one full run chunk
    assert meta["ops"]["run"] == 1
    assert out.shape == (1, 63, 3)


def test_rejects_malformed():
    good = encode_qoi(np.zeros((2, 2, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="bad magic"):
        decode_qoi(b"QOIF" + good[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_qoi(good[:10])
    with pytest.raises(ValueError, match="truncated"):
        decode_qoi(good[:-9])
    with pytest.raises(ValueError, match="end marker"):
        decode_qoi(good[:-1] + b"\x02")
    with pytest.raises(ValueError, match="trailing"):
        decode_qoi(good + b"\x00")
    with pytest.raises(ValueError, match="zero-dimension"):
        decode_qoi(_header(0, 5) + END)
    with pytest.raises(ValueError, match="channel"):
        decode_qoi(_header(1, 1, ch=2) + bytes((0xFE, 1, 2, 3)) + END)
    # a run overflowing the pixel count (1x2 image, RGB then RUN 5)
    with pytest.raises(ValueError, match="overflows"):
        decode_qoi(
            _header(2, 1) + bytes((0xFE, 1, 2, 3)) + bytes((0xC0 | 4,)) + END
        )
    with pytest.raises(ValueError, match="expected uint8"):
        encode_qoi(np.zeros((2, 2, 3), dtype=np.int32))
    with pytest.raises(ValueError, match="expected HxWx3/4"):
        encode_qoi(np.zeros((2, 2), dtype=np.uint8))


def test_first_pixel_run_against_initial_state():
    """Spec corner: the implicit starting pixel is (0,0,0,255), so an
    image beginning with opaque black opens with a RUN chunk."""
    img = np.zeros((1, 3, 4), dtype=np.uint8)
    img[:, :, 3] = 255
    data = encode_qoi(img)
    out, meta = decode_qoi(data)
    assert np.array_equal(out, img)
    assert meta["ops"] == {
        "run": 1,
        "index": 0,
        "diff": 0,
        "luma": 0,
        "rgb": 0,
        "rgba": 0,
    }


def test_certified_stream_exercises_op_ladder():
    """The mm_image_qoi synthesis drives RUN, DIFF, LUMA, RGB on every
    doc and INDEX across the corpus — the certified hash covers the
    whole ladder, not just the RGB fallback."""
    from console_datagen_spark.plans.extras import _qoi_synth_px

    totals: dict[str, int] = {}
    for doc_id in range(40):
        _, meta = decode_qoi(encode_qoi(_qoi_synth_px(doc_id)))
        for k, v in meta["ops"].items():
            totals[k] = totals.get(k, 0) + v
        for op in ("run", "diff", "luma", "rgb"):
            assert meta["ops"][op] > 0, (doc_id, op, meta["ops"])
    assert totals["index"] > 0, totals
