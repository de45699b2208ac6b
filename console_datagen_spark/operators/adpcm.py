"""IMA (DVI4) ADPCM codec in a WAV container — pure stdlib, no audio lib.

Closes a classification gap the FLAC round documented: "lossy codecs
have no hash-exact replay" is true of *entropy-coded* formats (MP3/
Vorbis float transforms + Huffman), but IMA ADPCM is lossy *and* a
deterministic integer recursion — quantize-to-4-bit against an adaptive
step table (IMA ADPCM reference algorithm; WAV format tag 0x11). The
encoder's predictor state IS the decoder's reconstruction, so the whole
encode→decode chain is replayable by a recursive-CTE SQL oracle: a lossy
codec inside the hash-certification gate.

Reference anchor: the north-star multimodal scope (console-datagen has
no media surface; this extends the audio tier beyond PCM/FLAC).

Format scope (rejects loudly outside it, like the other codecs here):
mono, 4-bit IMA nibbles (low nibble first), standard 4-byte block
header (initial sample int16 LE, step index, reserved 0), `fact` chunk
required for the true sample count, multi-block streams supported.

Scale shape: per-row payloads inside Arrow-batched ``mapInPandas`` —
embarrassingly parallel, no shuffle, no driver involvement.
"""

from __future__ import annotations

import struct

import numpy as np

STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
# Index deltas by nibble magnitude (low 3 bits); the sign bit does not
# affect the step-size adaptation.
INDEX_DELTA = (-1, -1, -1, -1, 2, 4, 6, 8)

WAVE_FORMAT_IMA_ADPCM = 0x11


def _step_update(pred: int, idx: int, nibble: int) -> tuple[int, int]:
    """One decoder state transition: (pred, idx) x nibble -> (pred', idx')."""
    step = STEP_TABLE[idx]
    d = step >> 3
    if nibble & 4:
        d += step
    if nibble & 2:
        d += step >> 1
    if nibble & 1:
        d += step >> 2
    pred = pred - d if nibble & 8 else pred + d
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + INDEX_DELTA[nibble & 7]))
    return pred, idx


def _encode_nibble(x: int, pred: int, idx: int) -> int:
    """Quantize sample x against predictor state -> 4-bit code.

    The magnitude bits are the standard successive-approximation against
    step, step/2, step/4 — chosen so the decoder's reconstruction
    d = step/8 + b2*step + b1*step/2 + b0*step/4 tracks the residual."""
    step = STEP_TABLE[idx]
    diff = x - pred
    sign = 8 if diff < 0 else 0
    if sign:
        diff = -diff
    n = 0
    if diff >= step:
        n |= 4
        diff -= step
    if diff >= step >> 1:
        n |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        n |= 1
    return sign | n


def encode_ima_adpcm(
    samples: np.ndarray, rate: int = 16_000, samples_per_block: int = 97
) -> bytes:
    """Mono int16 samples -> WAV (format tag 0x11) bytes.

    Each block: 4-byte header (sample 0 verbatim as int16 LE, current
    step index, reserved 0) + (samples_per_block - 1) nibbles packed
    low-first into (samples_per_block - 1) // 2 bytes. Per the IMA
    layout the nibble payload is word-aligned: samples_per_block must
    be 8k + 1. The final block may be short; `fact` carries the true
    total so the decoder can strip block padding exactly."""
    a = np.asarray(samples)
    if a.ndim != 1:
        raise ValueError(f"encode_ima_adpcm needs mono [n], got {a.shape}")
    if samples_per_block < 2 or (samples_per_block - 1) % 8:
        raise ValueError(
            f"samples_per_block must be 8k+1, got {samples_per_block}"
        )
    x = a.astype(np.int64)
    if len(x) == 0:
        raise ValueError("empty sample array")
    if int(x.max()) > 32767 or int(x.min()) < -32768:
        raise ValueError("samples out of int16 range")
    block_align = 4 + (samples_per_block - 1) // 2
    idx = 0
    blocks = []
    pos = 0
    while pos < len(x):
        pred = int(x[pos])
        header = struct.pack("<hBB", pred, idx, 0)
        chunk = x[pos + 1 : pos + samples_per_block]
        nibbles = []
        for xi in chunk:
            n = _encode_nibble(int(xi), pred, idx)
            pred, idx = _step_update(pred, idx, n)
            nibbles.append(n)
        # pad the final short block's nibble payload with repeats of the
        # current predictor (delta 0 is not exactly encodable; pad codes
        # are stripped on decode via the fact count, value irrelevant —
        # but keep them deterministic: zeros)
        while len(nibbles) < samples_per_block - 1:
            nibbles.append(0)
        data = bytes(
            nibbles[i] | (nibbles[i + 1] << 4) for i in range(0, len(nibbles), 2)
        )
        blocks.append(header + data)
        pos += samples_per_block
    data = b"".join(blocks)
    byte_rate = rate * block_align // samples_per_block
    fmt = struct.pack(
        "<HHIIHHHH",
        WAVE_FORMAT_IMA_ADPCM,
        1,
        rate,
        byte_rate,
        block_align,
        4,
        2,
        samples_per_block,
    )
    fact = struct.pack("<I", len(x))
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_ima_adpcm(content: bytes) -> tuple[np.ndarray, int]:
    """WAV (format tag 0x11) bytes -> (mono int16 reconstruction, rate).

    Verifies the container loudly: RIFF/WAVE magic, format tag 0x11,
    mono, 4-bit, samples_per_block consistent with block_align, a
    `fact` chunk (required for ADPCM per RIFF), block headers with
    step index <= 88 and reserved == 0."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (no RIFF/WAVE header)")
    pos = 12
    fmt_body = data = None
    total = None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        ln = struct.unpack("<I", content[pos + 4 : pos + 8])[0]
        body = content[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            fmt_body = body
        elif cid == b"fact":
            total = struct.unpack("<I", body[:4])[0]
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)
    if fmt_body is None or data is None:
        raise ValueError("WAV stream missing fmt/data chunk")
    if len(fmt_body) < 16:
        raise ValueError(f"truncated fmt chunk ({len(fmt_body)} bytes)")
    tag, n_ch, rate, _, block_align, bits = struct.unpack(
        "<HHIIHH", fmt_body[:16]
    )
    if tag != WAVE_FORMAT_IMA_ADPCM:
        raise ValueError(f"not IMA ADPCM (format tag {tag:#x})")
    if total is None:
        raise ValueError("ADPCM WAV requires a fact chunk (sample count)")
    if n_ch != 1:
        raise ValueError(f"only mono ADPCM supported ({n_ch} channels)")
    if bits != 4:
        raise ValueError(f"IMA ADPCM is 4-bit ({bits}-bit declared)")
    if len(fmt_body) < 20:
        raise ValueError("fmt chunk missing samples_per_block extension")
    samples_per_block = struct.unpack("<H", fmt_body[18:20])[0]
    if samples_per_block != (block_align - 4) * 2 + 1:
        raise ValueError(
            f"samples_per_block {samples_per_block} inconsistent with "
            f"block_align {block_align}"
        )
    out: list[int] = []
    for off in range(0, len(data), block_align):
        block = data[off : off + block_align]
        if len(block) < 4:
            raise ValueError("truncated ADPCM block header")
        pred, idx, reserved = struct.unpack("<hBB", block[:4])
        if idx > 88:
            raise ValueError(f"block step index {idx} out of range")
        if reserved:
            raise ValueError("nonzero reserved byte in block header")
        out.append(pred)
        for b in block[4:]:
            for n in (b & 0xF, b >> 4):
                pred, idx = _step_update(pred, idx, n)
                out.append(pred)
    if total > len(out):
        raise ValueError(f"fact count {total} exceeds decoded {len(out)}")
    return np.array(out[:total], dtype=np.int16), rate
