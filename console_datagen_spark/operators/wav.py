"""WAV (RIFF/PCM) codec — pure numpy + stdlib, no audio library.

The audio half of the multimodal tier ran on a deterministic fake
decoder (`multimodal._decode_bytes`) because librosa/soundfile are not
in this container — but WAV needs neither: like PPM/BMP on the image
side, it is an UNCOMPRESSED public byte layout (RIFF container, `fmt `
chunk, little-endian PCM frames) that numpy decodes directly. This
module closes the audio-codec gap the way the image tier was closed:
real bytes in, real samples out, deterministic everywhere, and — being
lossless — SQL-replayable end to end for hash certification.

Scope: PCM 16-bit (the interchange default), mono or interleaved
stereo, standard 44-byte header plus well-formed extra chunks (skipped
by the chunk walk). Compressed codecs (FLAC/MP3) remain the honest
library gap — rice/huffman audio coding is a codec library, not a byte
layout.

Scale shape: same as the image codecs — called from Arrow-batched
``mapInPandas`` kernels on per-row payloads, embarrassingly parallel,
no shuffle, no driver involvement.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """int16 samples ([n] mono or [n, 2] stereo) -> RIFF/PCM bytes."""
    a = np.asarray(samples, dtype="<i2")
    if a.ndim == 1:
        n_ch = 1
    elif a.ndim == 2 and a.shape[1] in (1, 2):
        n_ch = a.shape[1]
    else:
        raise ValueError(f"encode_wav needs [n] or [n, 1|2], got {a.shape}")
    data = a.tobytes()
    block_align = 2 * n_ch
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, rate, rate * block_align, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """RIFF/PCM bytes -> (int16 samples [n] or [n, 2], sample rate).

    Walks the chunk list (unknown chunks are skipped, per RIFF);
    rejects non-PCM formats and bit depths other than 16 loudly."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (no RIFF/WAVE header)")
    pos = 12
    n_ch = rate = None
    data = None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        ln = struct.unpack("<I", content[pos + 4 : pos + 8])[0]
        body = content[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            tag, n_ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if tag != 1:
                raise ValueError(f"only PCM WAV supported (format tag {tag})")
            if bits != 16:
                raise ValueError(f"only 16-bit PCM supported ({bits}-bit)")
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned (pad byte)
    if n_ch is None or data is None:
        raise ValueError("WAV stream missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    if n_ch == 2:
        samples = samples.reshape(-1, 2)
    elif n_ch != 1:
        raise ValueError(f"unsupported channel count {n_ch}")
    return samples, rate


def decimate(samples: np.ndarray, factor: int = 2) -> np.ndarray:
    """Integer downsample: keep every ``factor``-th sample — the audio
    twin of the image tier's exact nearest-neighbor map (no filtering,
    no float, hash-identical everywhere). A production resampler adds a
    low-pass first; the exact decimation is the certifiable core."""
    return samples[::factor]


def energy_windows_sumsq(
    samples: np.ndarray, window: int = 32, hop: int = 16
) -> list[tuple[int, int]]:
    """(win_idx, energy_permille) per COMPLETE window over mono int16
    samples: sum-of-squares scaled to permille of full-scale —
    Σ s^2 * 1000 // (window * 32768^2). Pure integers (no sqrt), so the
    SQL oracle replays it exactly; full-scale square uses 32768 so a
    -32768 sample cannot push past 1000."""
    s = samples.astype(np.int64)
    out = []
    w = 0
    denom = window * 32768 * 32768
    while w * hop + window <= len(s):
        seg = s[w * hop : w * hop + window]
        out.append((w, int((seg * seg).sum()) * 1000 // denom))
        w += 1
    return out
