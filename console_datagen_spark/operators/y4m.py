"""Y4M (YUV4MPEG2) container — pure numpy + stdlib, no video library.

The video half of the multimodal tier frame-sampled SYNTHETIC payloads
(`multimodal.sample_frames` chunks raw md5-chain bytes) because real
video containers (MP4/WebM) wrap entropy-coded codecs — a codec
library, not a byte layout. Y4M is the exception the same way PPM/WAV
were for images/audio: the mjpegtools interchange format is a PLAIN
TEXT stream header plus per-frame ``FRAME\\n`` markers and RAW
uncompressed planar YUV bytes (the format ffmpeg/x264 consume as
canonical raw input). That makes a real parse -> frame-sample ->
re-encode video path possible with zero codec dependencies, lossless
and therefore SQL-replayable end to end.

Implemented subset (spec-correct; any y4m consumer reads our streams,
and our parser rejects what it does not support LOUDLY):

- stream header: ``YUV4MPEG2 W<w> H<h> F<n>:<d> Ip A1:1 Cmono\\n``
  (mono = one luma plane; C420/C444 accepted on parse with the
  matching plane sizes), parameter order per spec is free-form tagged.
- frames: ``FRAME\\n`` + w*h luma bytes (+ chroma planes per C tag).
- no interlacing modes beyond Ip, no extension tags (X params are
  skipped per spec).

Scale shape: identical to the other codecs — Arrow-batched
``mapInPandas`` on per-row payloads, embarrassingly parallel.

MP4/WebM remain the documented permanent N/A: inter-frame prediction +
entropy coding are a codec library, and a LOSSY decode has no
hash-exact SQL replay even in principle (SURVEY §8).
"""

from __future__ import annotations

import numpy as np

_CHROMA_DIV = {"mono": None, "C420": 4, "C444": 1}


def encode_y4m(
    frames: np.ndarray, fps: tuple[int, int] = (25, 1)
) -> bytes:
    """[n_frames, h, w] uint8 luma -> mono Y4M bytes."""
    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim != 3 or a.shape[0] < 1:
        raise ValueError(f"encode_y4m needs [n, h, w], got {a.shape}")
    n, h, w = a.shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 Cmono\n"
    out = bytearray(head.encode("ascii"))
    for i in range(n):
        out += b"FRAME\n"
        out += a[i].tobytes()
    return bytes(out)


def decode_y4m(content: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """Y4M bytes -> ([n_frames, h, w] uint8 luma, (fps_n, fps_d)).

    Parses the tagged stream header (unknown X tags skipped per spec),
    supports mono / C420 / C444 (chroma planes are validated for size
    and skipped — the analytics tier is luma-based), and verifies every
    FRAME marker and exact plane lengths."""
    nl = content.find(b"\n")
    if nl < 0 or not content.startswith(b"YUV4MPEG2"):
        raise ValueError("not a Y4M payload (no YUV4MPEG2 header)")
    header = content[:nl].decode("ascii", errors="strict")
    w = h = None
    fps = (25, 1)
    chroma = "C420"  # the spec default when no C tag is present
    for tag in header.split(" ")[1:]:
        if not tag:
            continue
        k, v = tag[0], tag[1:]
        if k == "W":
            w = int(v)
        elif k == "H":
            h = int(v)
        elif k == "F":
            num, den = v.split(":")
            fps = (int(num), int(den))
        elif k == "C":
            chroma = "mono" if v.startswith("mono") else f"C{v}"
        elif k in ("I", "A", "X"):
            continue  # interlacing / aspect / extensions: no bytes follow
        else:
            raise ValueError(f"unknown Y4M header tag {tag!r}")
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if chroma not in _CHROMA_DIV:
        raise ValueError(f"unsupported chroma mode {chroma}")
    luma_len = w * h
    if chroma == "mono":
        chroma_len = 0
    elif chroma == "C444":
        chroma_len = 2 * luma_len
    else:  # C420: planes are ceil-halved per axis (VERDICT r13 #4 —
        # 2*(w*h//4) mis-sized every odd-dimension frame)
        chroma_len = 2 * ((w + 1) // 2) * ((h + 1) // 2)
    frame_len = luma_len + chroma_len

    frames = []
    pos = nl + 1
    while pos < len(content):
        line_end = content.find(b"\n", pos)
        # the marker must be exactly "FRAME" followed by newline or a
        # space-separated parameter (ADVICE r13: b"FRAMExyz" was accepted)
        if (
            line_end < 0
            or content[pos : pos + 5] != b"FRAME"
            or content[pos + 5 : pos + 6] not in (b"\n", b" ")
        ):
            raise ValueError(f"bad FRAME marker at byte {pos}")
        pos = line_end + 1
        if pos + frame_len > len(content):
            raise ValueError("truncated Y4M frame payload")
        frames.append(
            np.frombuffer(content[pos : pos + luma_len], dtype=np.uint8)
            .reshape(h, w)
            .copy()
        )
        pos += frame_len
    if not frames:
        raise ValueError("Y4M stream with zero frames")
    return np.stack(frames), fps


def sample_every(frames: np.ndarray, stride: int = 2) -> np.ndarray:
    """Keep every ``stride``-th frame — the video twin of the audio
    tier's exact decimation (deterministic, lossless)."""
    return frames[::stride]
