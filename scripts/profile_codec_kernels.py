"""Offline (no-Spark) per-doc timing of the mm codec kernels.

VERDICT r14 #3: either vectorize the Rice/LZW bit-writers or publish the
per-doc kernel cost that proves the bench numbers are floor-bound, and
close the item. This script replays each headline mm query's EXACT
per-doc work (same synth parameters, same op sequence as the
mapInPandas kernels in operators/multimodal.py / plans/extras.py) over
N docs on one core and prints ms/doc + the serial total for the bench's
500 docs — the number to compare against the query's wall clock / 32.

Usage: python scripts/profile_codec_kernels.py [n_docs] [--profile NAME]
  --profile NAME  additionally cProfile that kernel and print top-25.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from console_datagen_spark.operators.flac import (  # noqa: E402
    decode_flac,
    encode_flac,
)
from console_datagen_spark.operators.gif import (  # noqa: E402
    decode_gif,
    decode_gif_frames,
    encode_gif,
    encode_gif_anim,
)
from console_datagen_spark.operators.jpeg import (  # noqa: E402
    decode_jpeg,
    encode_jpeg,
    exact_tile_pixels,
)
from console_datagen_spark.operators.qoi import (  # noqa: E402
    decode_qoi,
    encode_qoi,
)

_GIF_PAL = None


def _chain(doc_id: int, n_bytes: int) -> bytes:
    """synth_media's md5 chain: block i = md5(f"{doc_id}:{i}")."""
    n_blocks = (n_bytes + 15) // 16
    out = b"".join(
        hashlib.md5(f"{doc_id}:{i}".encode()).digest() for i in range(n_blocks)
    )
    return out[:n_bytes]


def _pal() -> np.ndarray:
    global _GIF_PAL
    if _GIF_PAL is None:
        _GIF_PAL = np.array(
            [[(i * 7 + 13) % 256] * 3 for i in range(256)], dtype=np.uint8
        )
    return _GIF_PAL


# each kernel fn: doc_id -> None (runs the full synth+stats op sequence)


def k_flac_stereo(doc_id: int) -> None:
    # synth: 192 chain bytes -> 48 stereo samples, mid/side, block 16
    inter = np.frombuffer(_chain(doc_id, 192), dtype="<i2").astype(np.int64)
    chans = inter.reshape(-1, 2).T
    content = encode_flac(chans, 16_000, block_size=16, channel_mode="mid_side")
    # stats: decode -> re-encode left/side -> re-decode -> exact stats
    dec, rate = decode_flac(content)
    rt, rt_rate = decode_flac(
        encode_flac(dec.astype(np.int64), rate, channel_mode="left_side")
    )
    assert rt_rate == rate and np.array_equal(rt, dec)
    ch = dec.astype(np.int64)
    _ = (
        int((ch[0] * ch[0]).sum()),
        int((ch[1] * ch[1]).sum()),
        int((ch[0] * ch[1]).sum()),
    )


def k_flac_mono(doc_id: int) -> None:
    # synth: 96 mono samples; stats: decode -> decimate 2 -> encode -> decode
    samples = np.frombuffer(_chain(doc_id, 192), dtype="<i2").astype(np.int64)
    content = encode_flac(samples, 16_000)
    dec, rate = decode_flac(content)
    d = dec[::2]
    rt, rt_rate = decode_flac(encode_flac(d, rate))
    assert rt_rate == rate and np.array_equal(rt, d)
    s = d.astype(np.int64)
    _ = (int((s * s).sum()), int(s.min()), int(s.max()))


def k_gif16(doc_id: int) -> None:
    # synth: 16x16 interlaced GIF; stats: full decode + roundtrip + stats
    idx = np.frombuffer(_chain(doc_id, 256), dtype=np.uint8).reshape(16, 16)
    content = encode_gif(idx, _pal(), interlace=True)
    rgb, pal = decode_gif(content)
    luma = rgb[:, :, 0].astype(np.int64).ravel()
    pos = np.arange(len(luma), dtype=np.int64)
    inv = np.zeros(256, dtype=np.uint8)
    inv[pal[:, 0]] = np.arange(256, dtype=np.uint8)
    rt_rgb, _ = decode_gif(encode_gif(inv[rgb[:, :, 0]], pal, interlace=False))
    assert np.array_equal(rt_rgb, rgb)
    _ = (int(luma.sum()), int((pos * luma).sum()))


def k_gif_anim(doc_id: int) -> None:
    # synth: 8 frames 8x8; stats: decode all, keep stride 2, re-encode kept
    raw = np.frombuffer(_chain(doc_id, 512), dtype=np.uint8).reshape(8, 8, 8)
    content = encode_gif_anim(raw, _pal())
    frames, pal = decode_gif_frames(content)
    kept = frames[::2]
    inv = np.zeros(256, dtype=np.uint8)
    inv[pal[:, 0]] = np.arange(256, dtype=np.uint8)
    rt, _ = decode_gif_frames(encode_gif_anim(inv[kept[:, :, :, 0]], pal))
    assert np.array_equal(rt, kept)


def k_qoi(doc_id: int) -> None:
    # mm_image_qoi's synth pixels (plans/extras.py _qoi_synth_px)
    from console_datagen_spark.plans.extras import _qoi_synth_px

    src = _qoi_synth_px(int(doc_id))
    decoded, _meta = decode_qoi(encode_qoi(src))
    assert np.array_equal(decoded, src)


def k_jpeg_resize(doc_id: int) -> None:
    # synth: exact-tile 8x8 gray JPEG; stats: decode, 4x4 NN resize, sums
    px = exact_tile_pixels(int(doc_id))
    content = encode_jpeg(px, gray=True)
    arr = decode_jpeg(content)
    small = arr[::2, ::2]
    _ = int(small.astype(np.int64).sum())


KERNELS = {
    "mm_audio_flac_stereo": k_flac_stereo,
    "mm_audio_flac": k_flac_mono,
    "mm_image_gif": k_gif16,
    "mm_video_gif_anim": k_gif_anim,
    "mm_image_qoi": k_qoi,
    "mm_resize_jpeg": k_jpeg_resize,
}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 100
    prof = None
    if "--profile" in sys.argv:
        prof = sys.argv[sys.argv.index("--profile") + 1]
    out = {}
    for name, fn in KERNELS.items():
        fn(0)  # warm imports/jit tables outside the timer
        t0 = time.perf_counter()
        for d in range(n):
            fn(d)
        dt = time.perf_counter() - t0
        out[name] = {
            "ms_per_doc": round(dt / n * 1000, 3),
            "serial_500_docs_sec": round(dt / n * 500, 2),
        }
    print(json.dumps(out, indent=1))
    if prof:
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        for d in range(n):
            KERNELS[prof](d)
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(25)


if __name__ == "__main__":
    main()
