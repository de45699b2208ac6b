"""Multimodal (image/audio/video) column operators — north-star surface.

Design for 100 TB media pipelines: media travels as an opaque ``binary``
column plus a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` operators so each task
streams batches without materializing a partition in memory. Partitioning
is by content hash, so media of wildly different sizes spread evenly.

IMAGE codecs are REAL and pure numpy/stdlib: PPM, BMP, PNG (stdlib
zlib) and baseline JPEG (operators/jpeg.py) — no PIL/opencv needed.
Audio/video codecs (librosa / ffmpeg) are NOT in this container, so
those decode kernels are deterministic fakes behind ``_decode_bytes`` —
clearly marked, swappable via constructor injection. Everything
Spark-side (schemas, UDF signatures, batch iteration, determinism) is
real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "doc_id BIGINT, media_type STRING, fmt STRING, n_bytes INT, content BINARY"
)
FEATURE_DIM = 4
FEATURES_SCHEMA = (
    "doc_id BIGINT, media_type STRING, fmt STRING, n_bytes INT, "
    f"feature ARRAY<DOUBLE>"
)
FRAMES_SCHEMA = "doc_id BIGINT, frame_idx INT, frame BINARY"

_FORMATS = {"image": ("png", "jpeg"), "audio": ("wav", "flac"), "video": ("mp4", "webm")}


def synth_media(documents: DataFrame, media_type: str = "image", n_bytes: int = 256) -> DataFrame:
    """Attach a deterministic fake binary payload + metadata to each doc.

    Stands in for a real binary column read from parquet/tar shards; the
    bytes are an md5 chain of (doc_id, i) so every layer downstream is
    reproducible and partition-invariant.
    """
    fmts = _FORMATS[media_type]
    n_blocks = (n_bytes + 15) // 16
    content = F.unhex(
        F.substring(
            F.concat_ws(
                "",
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_blocks - 1)),
                    lambda i: F.md5(
                        F.concat_ws(":", F.col("doc_id").cast("string"), i.cast("string"))
                    ),
                ),
            ),
            1,
            n_bytes * 2,
        )
    )
    return documents.select(
        "doc_id",
        F.lit(media_type).alias("media_type"),
        F.element_at(
            F.array(*[F.lit(x) for x in fmts]),
            F.pmod(F.col("doc_id"), F.lit(len(fmts))).cast("int") + 1,
        ).alias("fmt"),
        F.lit(n_bytes).alias("n_bytes"),
        content.alias("content"),
    )


def _decode_bytes(content: bytes, fmt: str) -> np.ndarray:
    """STUB decode kernel — deterministic fake.

    A real deployment replaces this with PIL.Image.open / soundfile /
    pyav frame decode; the container has none of those, so we emit a
    stable FEATURE_DIM-vector derived from the bytes (chunk means scaled
    to [0,1]). Raises on empty payloads like a real decoder would.
    """
    if not content:
        raise ValueError("empty media payload")
    arr = np.frombuffer(content, dtype=np.uint8)
    chunks = np.array_split(arr, FEATURE_DIM)
    return np.array([float(c.mean()) / 255.0 for c in chunks])


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched).

    The kernel touches each batch exactly once and yields a same-length
    frame — the shape a real vision/audio encoder (or a GPU inference
    stage) plugs into.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_bytes(bytes(c), f).tolist()
                for c, f in zip(pdf["content"], pdf["fmt"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "fmt": pdf["fmt"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(kernel, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, frame_bytes: int = 32, stride: int = 2) -> DataFrame:
    """Frame-sample a "video" payload: split into frame_bytes chunks, keep
    every ``stride``-th — one output row per sampled frame (explode shape).

    Real impl: pyav keyframe iteration; the chunking stands in for it.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_frame = [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                raw = bytes(content)
                frames = [
                    raw[o : o + frame_bytes]
                    for o in range(0, len(raw), frame_bytes)
                ]
                for i in range(0, len(frames), stride):
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_frame.append(frames[i])
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_idx": out_idx, "frame": out_frame}
            )

    return media.mapInPandas(kernel, schema=FRAMES_SCHEMA)


# ---- REAL audio path (RIFF/PCM WAV, pure numpy — operators/wav.py) --------

WAV_STATS_SCHEMA = (
    "doc_id BIGINT, n_bytes INT, rate INT, n_samples INT, sumsq BIGINT, "
    "min_s INT, max_s INT"
)


def synth_wav_media(
    documents: DataFrame, n_samples: int = 96, rate: int = 16_000
) -> DataFrame:
    """Attach a VALID mono 16-bit PCM WAV per doc; samples are the
    md5-chain bytes read as little-endian int16 (the audio twin of
    synth_bitmap_media) — deterministic, lossless container, so the
    decode -> decimate path downstream is SQL-replayable end to end."""
    from .wav import encode_wav

    raw = synth_media(documents, "audio", n_bytes=2 * n_samples)

    def _to_wav(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = [
                encode_wav(np.frombuffer(bytes(c), dtype="<i2"), rate)
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "audio",
                    "fmt": "wav",
                    "n_bytes": [len(c) for c in content],
                    "content": content,
                }
            )

    return raw.mapInPandas(_to_wav, schema=MEDIA_SCHEMA)


def wav_decimate_stats(media: DataFrame, factor: int = 2) -> DataFrame:
    """REAL audio pipeline, one Arrow-batched pass: decode the WAV
    payload (RIFF chunk walk, int16 PCM), integer-decimate, RE-ENCODE
    (framing certified via n_bytes = 44 + 2 * n_out), and emit exact
    integer stats of the decimated samples (sum of squares, min, max) —
    every stage replayable by the SQL oracle because WAV is lossless."""
    from .wav import decimate, decode_wav, encode_wav

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                samples, rate = decode_wav(bytes(content))
                dec = decimate(samples, factor)
                reenc = encode_wav(dec, rate)
                s = dec.astype(np.int64)
                rows.append(
                    (
                        doc_id,
                        len(reenc),
                        rate,
                        len(dec),
                        int((s * s).sum()),
                        int(s.min()),
                        int(s.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_bytes",
                    "rate",
                    "n_samples",
                    "sumsq",
                    "min_s",
                    "max_s",
                ],
            )

    return media.mapInPandas(kernel, schema=WAV_STATS_SCHEMA)


# ---- REAL compressed-audio path (FLAC, pure numpy — operators/flac.py) ----

FLAC_STATS_SCHEMA = (
    "doc_id BIGINT, rate INT, n_samples INT, sumsq BIGINT, "
    "min_s INT, max_s INT, roundtrip_ok INT"
)


def synth_flac_media(
    documents: DataFrame, n_samples: int = 96, rate: int = 16_000
) -> DataFrame:
    """Attach a VALID mono 16-bit FLAC per doc — the compressed twin of
    synth_wav_media: the SAME md5-chain int16 samples, losslessly
    Rice/fixed-predictor coded (operators/flac.py), so the decode path
    downstream replays to the identical sample math the WAV oracle uses."""
    from .flac import encode_flac

    raw = synth_media(documents, "audio", n_bytes=2 * n_samples)

    def _to_flac(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = [
                encode_flac(np.frombuffer(bytes(c), dtype="<i2"), rate)
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "audio",
                    "fmt": "flac",
                    "n_bytes": [len(c) for c in content],
                    "content": content,
                }
            )

    return raw.mapInPandas(_to_flac, schema=MEDIA_SCHEMA)


def flac_decimate_stats(media: DataFrame, factor: int = 2) -> DataFrame:
    """REAL compressed-audio pipeline, one Arrow-batched pass: decode the
    FLAC payload (metadata walk, frame-header CRC-8, Rice/fixed-predictor
    subframe, frame CRC-16, STREAMINFO sample-MD5 — ALL verified),
    integer-decimate, RE-ENCODE as FLAC and RE-DECODE, asserting the
    roundtrip bit-exact in-kernel (encoded size is residual-dependent, so
    unlike WAV's fixed 44-byte framing the certifiable re-encode fact is
    decode(encode(x)) == x, emitted as roundtrip_ok). Sample stats replay
    in SQL exactly like the WAV path — FLAC is lossless."""
    from .flac import decode_flac, encode_flac
    from .wav import decimate

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                samples, rate = decode_flac(bytes(content))
                dec = decimate(samples, factor)
                rt, rt_rate = decode_flac(encode_flac(dec, rate))
                ok = int(rt_rate == rate and np.array_equal(rt, dec))
                s = dec.astype(np.int64)
                rows.append(
                    (
                        doc_id,
                        rate,
                        len(dec),
                        int((s * s).sum()),
                        int(s.min()),
                        int(s.max()),
                        ok,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "rate",
                    "n_samples",
                    "sumsq",
                    "min_s",
                    "max_s",
                    "roundtrip_ok",
                ],
            )

    return media.mapInPandas(kernel, schema=FLAC_STATS_SCHEMA)


# ---- LPC FLAC (r14: the LPC FIR inside the hash-certified loop) -----------


def flac_lpc_stats(documents: DataFrame, n_samples: int = 96) -> DataFrame:
    """Decode-side LPC in the CERTIFIED loop: wrap each doc's md5-chain
    int16 samples in an explicit-coefficient LPC stream (predictor
    [2047, -1023]/shift 10 ~ 2x[i-1] - x[i-2], coefficients the
    cost-driven encoder would never pick on noise), then fully decode —
    the integer FIR reconstruction must reproduce the chain samples
    exactly or the STREAMINFO MD5 check throws. Re-encode with the
    cost-driven encoder and re-decode for the roundtrip pin. One Arrow
    pass, same stats contract as mm_audio_flac (no decimation)."""
    from .flac import craft_lpc_stream, decode_flac, encode_flac

    raw = synth_media(documents, "audio", n_bytes=2 * n_samples)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                samples = np.frombuffer(bytes(content), dtype="<i2").astype(
                    np.int64
                )
                stream = craft_lpc_stream(
                    samples, [2047, -1023], shift=10, precision=12
                )
                dec, rate = decode_flac(stream)
                rt, rt_rate = decode_flac(encode_flac(dec, rate))
                ok = int(rt_rate == rate and np.array_equal(rt, dec))
                s = dec.astype(np.int64)
                rows.append(
                    (
                        doc_id,
                        rate,
                        len(s),
                        int((s * s).sum()),
                        int(s.min()),
                        int(s.max()),
                        ok,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "rate",
                    "n_samples",
                    "sumsq",
                    "min_s",
                    "max_s",
                    "roundtrip_ok",
                ],
            )

    return raw.mapInPandas(kernel, schema=FLAC_STATS_SCHEMA)


# ---- stereo FLAC (r14: decorrelation modes + multi-frame in the loop) -----

FLAC_STEREO_SCHEMA = (
    "doc_id BIGINT, rate INT, n_samples INT, sumsq_l BIGINT, "
    "sumsq_r BIGINT, min_l INT, max_l INT, min_r INT, max_r INT, "
    "dot_lr BIGINT, roundtrip_ok INT"
)


def synth_flac_stereo_media(
    documents: DataFrame, n_frames: int = 48, rate: int = 16_000
) -> DataFrame:
    """Attach a VALID stereo 16-bit FLAC per doc: the md5-chain bytes
    read as interleaved little-endian int16 (L,R,L,R...), encoded with
    FORCED mid/side decorrelation and a 16-sample block size — so the
    certified decode below must run the mid/side reconstruction AND the
    multi-frame walk (3 sequentially numbered frames per doc), not just
    the mono path re-labelled."""
    from .flac import encode_flac

    raw = synth_media(documents, "audio", n_bytes=4 * n_frames)

    def _to_flac(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = []
            for c in pdf["content"]:
                inter = np.frombuffer(bytes(c), dtype="<i2").astype(np.int64)
                chans = inter.reshape(-1, 2).T
                content.append(
                    encode_flac(
                        chans, rate, block_size=16, channel_mode="mid_side"
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "audio",
                    "fmt": "flac",
                    "n_bytes": [len(c) for c in content],
                    "content": content,
                }
            )

    return raw.mapInPandas(_to_flac, schema=MEDIA_SCHEMA)


def flac_stereo_stats(media: DataFrame) -> DataFrame:
    """REAL stereo compressed-audio pipeline, one Arrow-batched pass:
    decode the multi-frame mid/side FLAC (frame-number sequence, CRC-8/16
    per frame, interleaved-sample MD5 — ALL verified), then RE-ENCODE
    with the OTHER decorrelation mode (left/side) and RE-DECODE, pinning
    both reconstruction paths bit-exact in-kernel. Emits exact per-channel
    stats plus the cross-channel dot product — the de-interleave
    certificate: swap or misalign L/R anywhere and dot_lr breaks."""
    from .flac import decode_flac, encode_flac

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                chans, rate = decode_flac(bytes(content))
                if chans.ndim != 2 or chans.shape[0] != 2:
                    raise ValueError("expected stereo payload")
                rt, rt_rate = decode_flac(
                    encode_flac(
                        chans.astype(np.int64),
                        rate,
                        channel_mode="left_side",
                    )
                )
                ok = int(rt_rate == rate and np.array_equal(rt, chans))
                ch = chans.astype(np.int64)
                left, right = ch[0], ch[1]
                rows.append(
                    (
                        doc_id,
                        rate,
                        ch.shape[1],
                        int((left * left).sum()),
                        int((right * right).sum()),
                        int(left.min()),
                        int(left.max()),
                        int(right.min()),
                        int(right.max()),
                        int((left * right).sum()),
                        ok,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "rate",
                    "n_samples",
                    "sumsq_l",
                    "sumsq_r",
                    "min_l",
                    "max_l",
                    "min_r",
                    "max_r",
                    "dot_lr",
                    "roundtrip_ok",
                ],
            )

    return media.mapInPandas(kernel, schema=FLAC_STEREO_SCHEMA)


# ---- REAL video-container path (Y4M, pure numpy — operators/y4m.py) -------

Y4M_STATS_SCHEMA = (
    "doc_id BIGINT, n_frames INT, kept_frames INT, width INT, height INT, "
    "luma_sum BIGINT, luma_min INT, luma_max INT, roundtrip_ok INT"
)


def synth_y4m_media(
    documents: DataFrame, n_frames: int = 8, width: int = 8, height: int = 8
) -> DataFrame:
    """Attach a VALID mono Y4M stream per doc: frame pixels are the
    md5-chain bytes (frame k = bytes [k*w*h, (k+1)*w*h)) — the video
    twin of synth_wav_media. Y4M is raw/lossless, so the parse ->
    frame-sample path downstream is SQL-replayable end to end; the
    previous video tier chunked the SAME chain bytes without a real
    container, so mm_frames_checked's replay carries over conceptually."""
    from .y4m import encode_y4m

    raw = synth_media(documents, "video", n_bytes=n_frames * width * height)

    def _to_y4m(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = [
                encode_y4m(
                    np.frombuffer(bytes(c), dtype=np.uint8).reshape(
                        n_frames, height, width
                    )
                )
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "video",
                    "fmt": "y4m",
                    "n_bytes": [len(c) for c in content],
                    "content": content,
                }
            )

    return raw.mapInPandas(_to_y4m, schema=MEDIA_SCHEMA)


def y4m_frame_stats(media: DataFrame, stride: int = 2) -> DataFrame:
    """REAL video pipeline, one Arrow-batched pass: parse the Y4M
    container (tagged header, FRAME markers, exact plane lengths),
    sample every ``stride``-th frame, RE-ENCODE the sampled stream and
    RE-DECODE it (roundtrip_ok pins encode∘decode == id), and emit
    exact integer luma stats of the kept frames — every stage
    replayable by the SQL oracle because Y4M is raw bytes."""
    from .y4m import decode_y4m, encode_y4m, sample_every

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                frames, fps = decode_y4m(bytes(content))
                kept = sample_every(frames, stride)
                rt, rt_fps = decode_y4m(encode_y4m(kept, fps))
                ok = int(rt_fps == fps and np.array_equal(rt, kept))
                s = kept.astype(np.int64)
                rows.append(
                    (
                        doc_id,
                        frames.shape[0],
                        kept.shape[0],
                        frames.shape[2],
                        frames.shape[1],
                        int(s.sum()),
                        int(s.min()),
                        int(s.max()),
                        ok,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_frames",
                    "kept_frames",
                    "width",
                    "height",
                    "luma_sum",
                    "luma_min",
                    "luma_max",
                    "roundtrip_ok",
                ],
            )

    return media.mapInPandas(kernel, schema=Y4M_STATS_SCHEMA)


AUDIO_SCHEMA = "doc_id BIGINT, win_idx INT, energy_permille BIGINT, low_energy INT"


def audio_energy_windows(
    media: DataFrame,
    window_bytes: int = 64,
    hop_bytes: int = 32,
    low_permille: int = 480,
) -> DataFrame:
    """Sliding-window energy analysis over an "audio" byte stream — the
    audio analog of ``sample_frames``: one row per (doc, window) with the
    window's mean-amplitude permille and a low-energy (silence-candidate)
    flag. Real impl swaps the byte-mean for an RMS over decoded PCM
    samples (soundfile/librosa); the windowing, hop arithmetic and Arrow
    batch shape are exactly what that kernel plugs into.

    Integer permille (floor) so the output is hash-exact cross-engine;
    only COMPLETE windows are emitted (a real VAD pads or drops the tail
    — dropping is the deterministic choice).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        denom = 255 * window_bytes
        for pdf in batches:
            out_doc, out_idx, out_en, out_low = [], [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                arr = np.frombuffer(bytes(content), dtype=np.uint8)
                w = 0
                while w * hop_bytes + window_bytes <= len(arr):
                    s = int(arr[w * hop_bytes : w * hop_bytes + window_bytes].sum())
                    en = s * 1000 // denom
                    out_doc.append(doc_id)
                    out_idx.append(w)
                    out_en.append(en)
                    out_low.append(1 if en < low_permille else 0)
                    w += 1
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "win_idx": out_idx,
                    "energy_permille": out_en,
                    "low_energy": out_low,
                }
            )

    return media.mapInPandas(kernel, schema=AUDIO_SCHEMA)


# ---- real image codec path (uncompressed formats, pure numpy) -------------
#
# The container has no PIL/opencv, but the two standard UNCOMPRESSED
# raster formats need no codec library — their byte layouts are public
# and trivially numpy-decodable:
#   * PPM "P6" (Netpbm): ASCII header "P6\n<w> <h>\n255\n" + raw RGB
#     rows, top-down.
#   * BMP (BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER, 24 bpp,
#     uncompressed): BGR pixel rows, BOTTOM-up, each row padded to a
#     4-byte boundary.
# resize_images therefore does REAL decode -> nearest-neighbor resize ->
# re-encode for fmt in {"ppm", "bmp", "png", "jpeg"} (png via the
# stdlib-zlib codec below; jpeg via the pure-numpy baseline codec in
# operators/jpeg.py — fixed-point integer DCT + Annex K tables, the
# r11 verdict's last-format close).
# Nearest-neighbor uses the exact integer map src = (dst * src_dim) DIV
# dst_dim (no float rounding), so outputs are hash-identical on any
# engine — certified end-to-end by mm_resize_checked's SQL oracle.


def _decode_ppm(content: bytes) -> np.ndarray:
    """P6 PPM -> uint8[h, w, 3]. Minimal grammar: single whitespace
    separators, maxval 255 (what _encode_ppm and every common tool
    writes; a full Netpbm comment-aware parser is out of scope)."""
    import re

    # regex, NOT bytes.split: the raster is binary and may itself start
    # with whitespace bytes, which split() would swallow into the header
    # separator run. Per spec exactly ONE whitespace byte follows maxval.
    m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", content)
    if not m:
        raise ValueError("not a P6 PPM payload")
    w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    raster = content[m.end() : m.end() + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3).copy()


def _encode_ppm(arr: np.ndarray) -> bytes:
    h, w, _ = arr.shape
    return f"P6\n{w} {h}\n255\n".encode() + arr.astype(np.uint8).tobytes()


def _decode_bmp(content: bytes) -> np.ndarray:
    """24 bpp uncompressed BMP -> uint8[h, w, 3] RGB (rows un-flipped,
    BGR -> RGB, 4-byte row padding stripped)."""
    if content[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(content[10:14], "little")
    w = int.from_bytes(content[18:22], "little", signed=True)
    h = int.from_bytes(content[22:26], "little", signed=True)
    bpp = int.from_bytes(content[28:30], "little")
    compression = int.from_bytes(content[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    stride = (w * 3 + 3) & ~3
    raster = np.frombuffer(
        content[data_off : data_off + stride * abs(h)], dtype=np.uint8
    ).reshape(abs(h), stride)[:, : w * 3].reshape(abs(h), w, 3)
    rgb = raster[:, :, ::-1]  # BGR -> RGB
    if h > 0:  # positive height = bottom-up rows
        rgb = rgb[::-1]
    return rgb.copy()


def _encode_bmp(arr: np.ndarray) -> bytes:
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    raster = np.zeros((h, stride), dtype=np.uint8)
    raster[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # flip + RGB->BGR
    data = raster.tobytes()
    header = (
        b"BM"
        + (54 + len(data)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2  # 72 DPI
        + (0).to_bytes(4, "little") * 2
    )
    return header + data


# ---- PNG (stdlib zlib — deterministic, no codec library) ------------------
#
# PNG is the one COMPRESSED raster format closable without PIL/opencv:
# the container ships zlib, and the rest of the format is public byte
# layout (RFC 2083) — chunk framing with CRC-32, IHDR geometry, IDAT
# deflate stream, and the 5 scanline filters (None/Sub/Up/Average/
# Paeth). Scope: 8-bit truecolor RGB (color type 2), non-interlaced —
# the shape synth_bitmap_media writes and crawl thumbnails typically
# carry. The DECODER handles all 5 filters (the encoder can cycle
# through them per row, so the filter paths are genuinely executed and
# round-trip-tested); the encoder's default is filter 0 per row, the
# deterministic choice. jpeg is closed too — see operators/jpeg.py.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import zlib

    return (
        len(data).to_bytes(4, "big")
        + typ
        + data
        + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PaethPredictor over int16/int32 arrays (exact integer math)."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def _unfilter_row(
    ftype: int, line: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Reconstruct one scanline in place (line: uint8 filtered bytes)."""
    if ftype == 0:  # None
        return line
    if ftype == 2:  # Up — no intra-row dependency, fully vectorized
        return (line.astype(np.int32) + prev).astype(np.uint8)
    if ftype == 1:  # Sub — recon[x] = line[x] + recon[x-bpp]: a
        # per-channel-lane prefix sum; uint8 wraparound == mod 256 on
        # the running integer sum, so cumsum vectorizes it exactly
        lanes = line.reshape(-1, bpp).astype(np.int64)
        return (np.cumsum(lanes, axis=0) % 256).astype(np.uint8).reshape(-1)
    # Average/Paeth recur on BOTH the just-reconstructed left pixel and
    # the prior row, so their column loop is inherently serial; rows
    # here are small (the registered queries use 8x8), and a real
    # deployment swaps in PIL.
    recon = line.astype(np.int32)
    for x in range(len(line)):
        a = recon[x - bpp] if x >= bpp else 0
        b = int(prev[x])
        if ftype == 3:  # Average
            recon[x] = (recon[x] + (a + b) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            c = int(prev[x - bpp]) if x >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            recon[x] = (recon[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return recon.astype(np.uint8)


def _decode_png(content: bytes) -> np.ndarray:
    """PNG -> uint8[h, w, 3]. 8-bit RGB (color type 2), non-interlaced;
    all 5 scanline filters supported. CRCs are trusted, not verified
    (zlib.decompress fails loudly on corrupt IDAT anyway)."""
    import struct
    import zlib

    if content[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, w, h = 8, [], None, None
    while pos + 8 <= len(content):
        ln = int.from_bytes(content[pos : pos + 4], "big")
        typ = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # 4 len + 4 type + data + 4 crc
        if typ == b"IHDR":
            w, h, bitd, color, comp, filt, inter = struct.unpack(
                ">IIBBBBB", data
            )
            if (bitd, color, comp, filt, inter) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "unsupported PNG (need 8-bit RGB non-interlaced): "
                    f"depth={bitd} color={color} interlace={inter}"
                )
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(b"".join(idat))
    stride = w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        o = y * (stride + 1)
        line = np.frombuffer(raw[o + 1 : o + 1 + stride], dtype=np.uint8)
        out[y] = _unfilter_row(raw[o], line.copy(), prev, bpp=3)
        prev = out[y].astype(np.int32)
    return out.reshape(h, w, 3).copy()


def _filter_row(
    ftype: int, line: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Apply one PNG filter to a raw scanline (all inputs uint8)."""
    cur = line.astype(np.int32)
    a = np.zeros_like(cur)
    a[bpp:] = cur[:-bpp]
    b = prev.astype(np.int32)
    c = np.zeros_like(b)
    c[bpp:] = b[:-bpp]
    if ftype == 0:
        out = cur
    elif ftype == 1:
        out = cur - a
    elif ftype == 2:
        out = cur - b
    elif ftype == 3:
        out = cur - (a + b) // 2
    elif ftype == 4:
        out = cur - _paeth(
            a.astype(np.uint8), b.astype(np.uint8), c.astype(np.uint8)
        )
    else:
        raise ValueError(f"unknown PNG filter type {ftype}")
    return (out & 0xFF).astype(np.uint8)


def _encode_png(arr: np.ndarray, row_filters: str = "none") -> bytes:
    """uint8[h, w, 3] -> PNG bytes. ``row_filters="none"`` writes filter
    0 every row (the deterministic default the resize path emits);
    ``"cycle"`` writes filter y % 5 so every decode filter path is
    genuinely exercised by the synth -> decode round trip."""
    import struct
    import zlib

    h, w, _ = arr.shape
    flat = arr.reshape(h, w * 3).astype(np.uint8)
    prev = np.zeros(w * 3, dtype=np.uint8)
    parts = []
    for y in range(h):
        f = (y % 5) if row_filters == "cycle" else 0
        parts.append(bytes([f]))
        parts.append(_filter_row(f, flat[y], prev, bpp=3).tobytes())
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(parts), 6))
        + _png_chunk(b"IEND", b"")
    )


from .jpeg import decode_jpeg as _decode_jpeg  # noqa: E402
from .jpeg import encode_jpeg as _encode_jpeg  # noqa: E402

_CODECS = {
    "ppm": (_decode_ppm, _encode_ppm),
    "bmp": (_decode_bmp, _encode_bmp),
    "png": (_decode_png, _encode_png),
    # baseline JFIF, pure numpy + stdlib (operators/jpeg.py) — the last
    # raster format closed; lossy, so only the verified exact-round-trip
    # tile synthesis is SQL-replayable (general images are pytest-bound)
    "jpeg": (_decode_jpeg, _encode_jpeg),
}


def _resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    src_h, src_w, _ = img.shape
    ys = (np.arange(height) * src_h) // height
    xs = (np.arange(width) * src_w) // width
    return img[ys][:, xs]


def synth_bitmap_media(
    documents: DataFrame, width: int = 8, height: int = 8, fmt: str = "ppm"
) -> DataFrame:
    """Attach a VALID raster image payload per doc, pixels from the same
    md5 chain as ``synth_media`` — deterministic, so the decode ->
    resize path downstream is SQL-replayable end to end.

    ``fmt="jpeg"`` is the lossy exception: md5-chain noise does not
    survive quantization, so its payloads are 8x8 GRAYSCALE images from
    the codec's verified exact-round-trip tile set
    (``operators/jpeg.py`` EXACT_TILES — tile index ``doc_id % K``, DC
    offset ``+2 * (doc_id % 29)``), which keeps decode(encode(px)) ==
    px and therefore keeps the downstream replay exact; ``width`` /
    ``height`` must be 8."""
    if fmt not in _CODECS:
        raise ValueError(f"fmt must be one of {sorted(_CODECS)}: {fmt!r}")
    if fmt == "jpeg":
        if (width, height) != (8, 8):
            raise ValueError("jpeg synthesis is tile-based: width=height=8")
        from .jpeg import exact_tile_pixels

        def _to_jpeg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                content = [
                    _encode_jpeg(exact_tile_pixels(int(d)))
                    for d in pdf["doc_id"]
                ]
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "media_type": "image",
                        "fmt": "jpeg",
                        "n_bytes": [len(c) for c in content],
                        "content": content,
                    }
                )

        return documents.select("doc_id").mapInPandas(
            _to_jpeg, schema=MEDIA_SCHEMA
        )
    n_px = width * height * 3
    raw = synth_media(documents, "image", n_bytes=n_px)
    if fmt == "ppm":
        header = F.lit(f"P6\n{width} {height}\n255\n".encode())
        content = F.concat(header, F.col("content"))
    elif fmt == "png":
        # encode with CYCLING row filters (y % 5) so the downstream
        # decode genuinely runs Sub/Up/Average/Paeth reconstruction,
        # not just the trivial filter-0 path
        def _to_png(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pdf = pdf.copy()
                pdf["content"] = [
                    _encode_png(
                        np.frombuffer(bytes(c), dtype=np.uint8).reshape(
                            height, width, 3
                        ),
                        row_filters="cycle",
                    )
                    for c in pdf["content"]
                ]
                yield pdf

        return (
            raw.mapInPandas(_to_png, schema=MEDIA_SCHEMA)
            .withColumn("fmt", F.lit("png"))
            .withColumn("n_bytes", F.length("content").cast("int"))
        )
    else:
        # BMP needs row flip + BGR + padding: JVM-side byte surgery is
        # possible but unreadable; build via the same encoder the resize
        # kernel uses (Arrow-batched, not row-at-a-time Python)
        def _to_bmp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pdf = pdf.copy()
                pdf["content"] = [
                    _encode_bmp(
                        np.frombuffer(bytes(c), dtype=np.uint8).reshape(
                            height, width, 3
                        )
                    )
                    for c in pdf["content"]
                ]
                yield pdf

        return (
            raw.mapInPandas(_to_bmp, schema=MEDIA_SCHEMA)
            .withColumn("fmt", F.lit("bmp"))
            .withColumn("n_bytes", F.length("content").cast("int"))
        )
    return raw.select(
        "doc_id",
        "media_type",
        F.lit(fmt).alias("fmt"),
        F.length(content).cast("int").alias("n_bytes"),
        content.alias("content"),
    )


RESIZED_SCHEMA = (
    "doc_id BIGINT, fmt STRING, width INT, height INT, content BINARY"
)


def resize_images(
    media: DataFrame, width: int, height: int, out_fmt: str | None = None
) -> DataFrame:
    """Decode -> nearest-neighbor resize -> re-encode, Arrow-batched.

    REAL for every format: "ppm" / "bmp" (pure numpy), "png" (numpy +
    stdlib zlib), and "jpeg" (the pure-numpy baseline codec,
    operators/jpeg.py). Exact integer index map => byte-identical
    output everywhere (certified by mm_resize_checked's full SQL
    replay). ``out_fmt`` re-encodes into a DIFFERENT format than the
    input (e.g. jpeg in, ppm out — the lossless-out spelling a
    downstream exact consumer wants after a lossy decode); None keeps
    the source format.
    """
    if out_fmt is not None and out_fmt not in _CODECS:
        raise ValueError(f"out_fmt must be one of {sorted(_CODECS)}: {out_fmt!r}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            fmts = []
            for content, fmt in zip(pdf["content"], pdf["fmt"]):
                codec = _CODECS.get(fmt)
                if codec is None:
                    raise NotImplementedError(
                        f"fmt {fmt!r} has no native codec here; "
                        "ppm/bmp/png/jpeg are supported"
                    )
                decode = codec[0]
                target = out_fmt or fmt
                encode = _CODECS[target][1]
                fmts.append(target)
                out.append(encode(_resize_nearest(decode(bytes(content)), width, height)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fmt": fmts,
                    "width": width,
                    "height": height,
                    "content": out,
                }
            )

    return media.mapInPandas(kernel, schema=RESIZED_SCHEMA)


CHANNEL_SUMS_SCHEMA = (
    "doc_id BIGINT, n_bytes INT, r_sum BIGINT, g_sum BIGINT, b_sum BIGINT"
)


def channel_sums(resized: DataFrame) -> DataFrame:
    """Per-image RGB channel sums — decodes the (ppm/bmp) payload again,
    so a query chaining synth -> resize -> channel_sums certifies decode,
    resize AND re-encode byte-for-byte via its integer output."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sums = np.array(
                [
                    _CODECS[f][0](bytes(c)).sum(axis=(0, 1), dtype=np.int64)
                    for c, f in zip(pdf["content"], pdf["fmt"])
                ]
            ).reshape(-1, 3)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(bytes(c)) for c in pdf["content"]],
                    "r_sum": sums[:, 0],
                    "g_sum": sums[:, 1],
                    "b_sum": sums[:, 2],
                }
            )

    return resized.mapInPandas(kernel, schema=CHANNEL_SUMS_SCHEMA)


PNG_STATS_SCHEMA = (
    "doc_id BIGINT, ihdr_w INT, ihdr_h INT, r_sum BIGINT, g_sum BIGINT, "
    "b_sum BIGINT"
)


def png_stats(resized: DataFrame) -> DataFrame:
    """Decode a PNG payload column and emit IHDR geometry + RGB channel
    sums in ONE Arrow-batched pass (no join between a header parse and
    ``channel_sums``). Chaining synth(png, cycling filters) -> resize ->
    png_stats certifies the zlib inflate, all five filter
    reconstructions, the integer resize AND the re-encode framing: the
    IHDR dims come from re-parsing the re-encoded bytes and the sums
    from re-decoding them."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, sums = [], [], []
            for c in pdf["content"]:
                img = _decode_png(bytes(c))
                hs.append(img.shape[0])
                ws.append(img.shape[1])
                sums.append(img.sum(axis=(0, 1), dtype=np.int64))
            s = np.array(sums).reshape(-1, 3)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "ihdr_w": ws,
                    "ihdr_h": hs,
                    "r_sum": s[:, 0],
                    "g_sum": s[:, 1],
                    "b_sum": s[:, 2],
                }
            )

    return resized.mapInPandas(kernel, schema=PNG_STATS_SCHEMA)


def media_fingerprint(media: DataFrame) -> DataFrame:
    """Content-hash dedup key for binary media (sha256 via JVM built-in)."""
    return media.select(
        "doc_id", F.sha2(F.col("content"), 256).alias("content_sha256")
    )


def _fake_decode_reference(content: bytes) -> list[float]:
    """Reference impl of the fake decode for tests (pure Python)."""
    arr = list(content)
    n = len(arr)
    out = []
    base = n // FEATURE_DIM
    rem = n % FEATURE_DIM
    start = 0
    for i in range(FEATURE_DIM):
        size = base + (1 if i < rem else 0)
        chunk = arr[start : start + size]
        out.append(sum(chunk) / len(chunk) / 255.0)
        start += size
    return out


def _md5_chain_bytes(doc_id: int, n_bytes: int) -> bytes:
    """Python twin of synth_media's byte derivation (for tests)."""
    n_blocks = (n_bytes + 15) // 16
    hexes = "".join(
        hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest() for i in range(n_blocks)
    )
    return bytes.fromhex(hexes[: n_bytes * 2])


def extract_features_permille(media: DataFrame) -> DataFrame:
    """Hash-checkable twin of ``extract_features``: integer-permille chunk
    means via pure integer arithmetic (sum*1000 // (n*255)), serialized to
    a comma-joined string. Exact in any engine — this is what lets the
    DuckDB oracle certify the mapInPandas decode path itself, not just its
    row count. Same Arrow-batched kernel shape as the float path.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for c in pdf["content"]:
                arr = np.frombuffer(bytes(c), dtype=np.uint8)
                chunks = np.array_split(arr, FEATURE_DIM)
                feats.append(
                    ",".join(
                        str(int(ch.sum(dtype=np.int64)) * 1000 // (len(ch) * 255))
                        for ch in chunks
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"],
                    "feature_permille": feats,
                }
            )

    return media.mapInPandas(
        kernel, schema="doc_id BIGINT, n_bytes INT, feature_permille STRING"
    )


# ---- IMA ADPCM (r14: a LOSSY codec inside the hash-certified loop) --------

ADPCM_STATS_SCHEMA = (
    "doc_id BIGINT, n_bytes INT, rate INT, n_samples INT, sumsq BIGINT, "
    "min_s INT, max_s INT"
)


def synth_adpcm_media(
    documents: DataFrame,
    n_samples: int = 194,
    rate: int = 16_000,
    samples_per_block: int = 97,
) -> DataFrame:
    """Attach a VALID mono IMA-ADPCM WAV (format tag 0x11) per doc: the
    md5-chain bytes read as little-endian int16 become the encoder INPUT.
    Unlike the PCM/FLAC twins the payload samples are NOT the chain —
    ADPCM is lossy — but the quantizer is a deterministic integer
    recursion, so the downstream decode is still SQL-replayable (the
    oracle re-runs encoder+decoder state from the chain). Default is two
    full 97-sample blocks so the block walk itself sits in the hash gate."""
    from .adpcm import encode_ima_adpcm

    raw = synth_media(documents, "audio", n_bytes=2 * n_samples)

    def _to_adpcm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = [
                encode_ima_adpcm(
                    np.frombuffer(bytes(c), dtype="<i2"),
                    rate,
                    samples_per_block=samples_per_block,
                )
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "audio",
                    "fmt": "adpcm",
                    "n_bytes": [len(c) for c in content],
                    "content": content,
                }
            )

    return raw.mapInPandas(_to_adpcm, schema=MEDIA_SCHEMA)


def adpcm_reconstruction_stats(media: DataFrame) -> DataFrame:
    """REAL lossy-audio pipeline, one Arrow-batched pass: decode the IMA
    ADPCM payload (RIFF walk, fmt 0x11 validation, fact count, per-block
    header + nibble state machine) and emit exact integer stats of the
    RECONSTRUCTION. n_bytes re-certifies the container arithmetic (fixed
    header framing + ceil-block data length). The oracle replays the
    encoder+decoder recursion from the chain samples — certifying that a
    lossy-but-integer-deterministic codec hash-replays end to end, which
    pins the repo's media classification: the N/A wall is entropy coding,
    not lossiness."""
    from .adpcm import decode_ima_adpcm

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content, nb in zip(
                pdf["doc_id"], pdf["content"], pdf["n_bytes"]
            ):
                recon, rate = decode_ima_adpcm(bytes(content))
                s = recon.astype(np.int64)
                rows.append(
                    (
                        doc_id,
                        int(nb),
                        rate,
                        len(recon),
                        int((s * s).sum()),
                        int(s.min()),
                        int(s.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_bytes",
                    "rate",
                    "n_samples",
                    "sumsq",
                    "min_s",
                    "max_s",
                ],
            )

    return media.mapInPandas(kernel, schema=ADPCM_STATS_SCHEMA)


# ---- GIF (r14: dictionary-coded lossless image inside the hash gate) ------

GIF_STATS_SCHEMA = (
    "doc_id BIGINT, width INT, height INT, luma_sum BIGINT, "
    "luma_posw BIGINT, luma_min INT, luma_max INT, roundtrip_ok INT"
)

# Permutation gray palette: entry i renders as gray (i*7+13) % 256 —
# a bijection (gcd(7, 256) = 1) so the palette LOOKUP is in the hash
# gate: an identity palette would let a decoder that skips the color
# table pass anyway.
_GIF_PAL_MUL, _GIF_PAL_ADD = 7, 13


def synth_gif_media(
    documents: DataFrame, width: int = 16, height: int = 16
) -> DataFrame:
    """Attach a VALID interlaced GIF89a per doc: md5-chain bytes are the
    palette indices, the global color table is the permutation gray
    palette, and the 4-pass interlace row order is ON — so LZW decode,
    palette indirection AND de-interlacing all sit inside the certified
    query's position-weighted checksum."""
    from .gif import encode_gif

    pal = np.array(
        [[(i * _GIF_PAL_MUL + _GIF_PAL_ADD) % 256] * 3 for i in range(256)],
        dtype=np.uint8,
    )
    raw = synth_media(documents, "image", n_bytes=width * height)

    def _to_gif(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = [
                encode_gif(
                    np.frombuffer(bytes(c), dtype=np.uint8).reshape(
                        height, width
                    ),
                    pal,
                    interlace=True,
                )
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "image",
                    "fmt": "gif",
                    "n_bytes": [len(c) for c in content],
                    "content": content,
                }
            )

    return raw.mapInPandas(_to_gif, schema=MEDIA_SCHEMA)


def gif_luma_stats(media: DataFrame) -> DataFrame:
    """REAL dictionary-coded image pipeline, one Arrow-batched pass:
    decode the GIF payload (LZW with late width change + mid-stream
    dictionary resets, palette lookup, de-interlace), then emit exact
    integer luma stats. luma_posw = Σ p * luma[p] over row-major pixel
    position p is ORDER-SENSITIVE, so a decoder that mis-places
    interlaced rows (or desynchronizes LZW at a width boundary) fails
    the hash even when the pixel multiset is right. roundtrip_ok pins
    the non-interlaced re-encode/re-decode identity."""
    from .gif import decode_gif, encode_gif

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                rgb, pal = decode_gif(bytes(content))
                luma = rgb[:, :, 0].astype(np.int64).ravel()
                pos = np.arange(len(luma), dtype=np.int64)
                # invert the permutation palette to recover indices for
                # the re-encode (gray -> index is the inverse bijection)
                inv = np.zeros(256, dtype=np.uint8)
                inv[pal[:, 0]] = np.arange(256, dtype=np.uint8)
                rt_rgb, _ = decode_gif(
                    encode_gif(inv[rgb[:, :, 0]], pal, interlace=False)
                )
                rows.append(
                    (
                        doc_id,
                        rgb.shape[1],
                        rgb.shape[0],
                        int(luma.sum()),
                        int((pos * luma).sum()),
                        int(luma.min()),
                        int(luma.max()),
                        int(np.array_equal(rt_rgb, rgb)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "luma_sum",
                    "luma_posw",
                    "luma_min",
                    "luma_max",
                    "roundtrip_ok",
                ],
            )

    return media.mapInPandas(kernel, schema=GIF_STATS_SCHEMA)


# ---- animated GIF (r14: LZW video-tier path — frame-sampled analytics) ----

GIF_ANIM_SCHEMA = (
    "doc_id BIGINT, n_frames INT, kept_frames INT, width INT, height INT, "
    "luma_sum BIGINT, luma_posw BIGINT, luma_min INT, luma_max INT, "
    "roundtrip_ok INT"
)


def synth_gif_anim_media(
    documents: DataFrame, n_frames: int = 8, width: int = 8, height: int = 8
) -> DataFrame:
    """Attach a VALID animated GIF89a per doc (NETSCAPE loop extension,
    per-frame graphic-control blocks): frame k's palette indices are
    chain bytes [k*w*h, (k+1)*w*h) under the permutation gray palette —
    the LZW twin of the Y4M raw-video path."""
    from .gif import encode_gif_anim

    pal = np.array(
        [[(i * _GIF_PAL_MUL + _GIF_PAL_ADD) % 256] * 3 for i in range(256)],
        dtype=np.uint8,
    )
    raw = synth_media(documents, "video", n_bytes=n_frames * width * height)

    def _to_gif(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = [
                encode_gif_anim(
                    np.frombuffer(bytes(c), dtype=np.uint8).reshape(
                        n_frames, height, width
                    ),
                    pal,
                )
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "video",
                    "fmt": "gif",
                    "n_bytes": [len(c) for c in content],
                    "content": content,
                }
            )

    return raw.mapInPandas(_to_gif, schema=MEDIA_SCHEMA)


def gif_anim_frame_stats(media: DataFrame, stride: int = 2) -> DataFrame:
    """Frame-sampled animated-GIF analytics, one Arrow pass: decode ALL
    frames (per-frame LZW streams, extension skips, full-canvas check),
    keep every ``stride``-th, and emit exact luma stats over the kept
    frames. luma_posw weights each pixel by its ORIGINAL position in the
    full frame stack (frame k pixel j -> k*w*h + j), so both frame
    selection and in-frame pixel order are inside the hash. roundtrip_ok
    re-encodes the kept stack and re-decodes it."""
    from .gif import decode_gif_frames, encode_gif_anim

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                frames, pal = decode_gif_frames(bytes(content))
                n, h, w, _ = frames.shape
                kept = frames[::stride]
                luma = kept[:, :, :, 0].astype(np.int64)
                k_idx = np.arange(0, n, stride, dtype=np.int64)
                pos = (
                    k_idx[:, None] * (h * w)
                    + np.arange(h * w, dtype=np.int64)[None, :]
                )
                flat = luma.reshape(len(k_idx), h * w)
                inv = np.zeros(256, dtype=np.uint8)
                inv[pal[:, 0]] = np.arange(256, dtype=np.uint8)
                rt, _ = decode_gif_frames(
                    encode_gif_anim(inv[kept[:, :, :, 0]], pal)
                )
                rows.append(
                    (
                        doc_id,
                        n,
                        len(k_idx),
                        w,
                        h,
                        int(flat.sum()),
                        int((pos * flat).sum()),
                        int(flat.min()),
                        int(flat.max()),
                        int(np.array_equal(rt, kept)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_frames",
                    "kept_frames",
                    "width",
                    "height",
                    "luma_sum",
                    "luma_posw",
                    "luma_min",
                    "luma_max",
                    "roundtrip_ok",
                ],
            )

    return media.mapInPandas(kernel, schema=GIF_ANIM_SCHEMA)
