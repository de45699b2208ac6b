"""Baseline JPEG codec — pure numpy + stdlib, no codec library.

Closes the last multimodal format gap (r11 verdict #3): ``resize_images``
previously raised for jpeg because lossy DCT entropy coding needs "a
real codec library" — this module IS that codec, written against the
public ITU-T T.81 byte layout the same way the PNG codec was written
against RFC 2083:

- Baseline sequential DCT, 8-bit, non-progressive (SOF0).
- 1-component (grayscale) and 3-component 4:4:4 YCbCr (no chroma
  subsampling — the deterministic choice; subsampled or progressive
  streams are rejected loudly).
- Annex K quantization tables (the "typical" luma/chroma tables every
  camera default derives from) and the Annex K "typical" Huffman
  tables, both WRITTEN INTO the stream (DQT/DHT) — JPEG is
  self-describing, so the decoder reads whatever tables the file
  carries rather than assuming these.
- All DCT math is FIXED-POINT INTEGER (a 2^13-scaled orthonormal DCT
  matrix, int64 matmuls, explicit round-half-away-from-zero), so
  encode and decode are bit-deterministic on every host — no libm, no
  SIMD-reduction ordering, nothing float in the data path.

Lossy-codec certification (how mm_resize_jpeg can be hash-exact): a
general image does NOT survive quantize->dequantize, so the registered
query synthesizes its images from EXACT_TILES — 8x8 patterns derived
at import time as the integer IDCT of hand-picked quantized-coefficient
matrices (DC plus low/high-frequency AC structure), then VERIFIED to
round-trip encode->decode bit-exactly at every DC offset the synthesis
uses (quantization is exact when the coefficients are exact multiples
of the quant steps; the DC offset moves in whole quant steps, which the
linear integer transform carries exactly). Import fails loudly if any
tile ever stops being exact, so the certification can never silently
weaken. General images are covered by pytest error-bound and
wire-format tests, not by the SQL oracle.

Scale shape: the codec is called from Arrow-batched ``mapInPandas``
kernels (operators/multimodal.py) on per-row payloads — embarrassingly
parallel, no shuffle, no driver involvement; the entropy coder is
bit-serial per IMAGE, which is the codec-correct granularity (images
are the parallel unit, exactly how a real thumbnail pipeline shards).
"""

from __future__ import annotations

import struct

import numpy as np

# ---- tables (ITU-T T.81 Annex K) -------------------------------------------

Q_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)

Q_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

# Huffman specs as (BITS[1..16], HUFFVAL) — the Annex K typical tables.
DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _zigzag_order() -> np.ndarray:
    """The standard zig-zag scan as (row, col) -> scan index, generated
    by the diagonal walk rather than memorized (T.81 Figure A.6)."""
    order = np.empty((8, 8), dtype=np.int64)
    r = c = 0
    for i in range(64):
        order[r, c] = i
        if (r + c) % 2 == 0:  # moving up-right
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:  # moving down-left
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    return order


ZIGZAG = _zigzag_order()  # [r, c] -> zigzag position
ZZ_FLAT = np.argsort(ZIGZAG.reshape(-1))  # zigzag position -> flat index

# ---- fixed-point DCT --------------------------------------------------------

_DCT_SHIFT = 13


def _dct_matrix() -> np.ndarray:
    """2^13-scaled orthonormal 8-point DCT-II matrix, rounded once at
    module load (the only float touch; the rounded INTEGER matrix is
    the spec both engines of the pipeline share thereafter)."""
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c[0, :] = 1 / np.sqrt(2)
    m = c * 0.5  # orthonormal scaling: C @ C.T = I
    return np.round(m * (1 << _DCT_SHIFT)).astype(np.int64)


_A = _dct_matrix()
_SCALE2 = 1 << (2 * _DCT_SHIFT)  # the A @ X @ A.T product's scale


def _round_div(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    """Elementwise round(num / den) half away from zero, exact int64."""
    num = num.astype(np.int64)
    den = np.broadcast_to(np.asarray(den, dtype=np.int64), num.shape)
    pos = (2 * np.abs(num) + den) // (2 * den)
    return np.where(num >= 0, pos, -pos)


def _fdct_quant(block: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Level-shifted 8x8 int block -> quantized coefficients (int64)."""
    t = _A @ block.astype(np.int64) @ _A.T  # value * 2^26
    return _round_div(t, q * _SCALE2)


def _dequant_idct(coef: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Quantized coefficients -> 8x8 pixel block (uint8, +128 shift)."""
    f = coef.astype(np.int64) * q
    t = _A.T @ f @ _A  # value * 2^26
    x = _round_div(t, np.int64(_SCALE2)) + 128
    return np.clip(x, 0, 255).astype(np.uint8)


# ---- Huffman ---------------------------------------------------------------


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self._buf = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            b = (self._acc >> (self._n - 8)) & 0xFF
            self._buf.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self._buf.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def done(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self._buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self._d = data
        self._pos = 0
        self._acc = 0
        self._n = 0

    def read(self, n: int) -> int:
        while self._n < n:
            if self._pos >= len(self._d):
                raise ValueError("truncated JPEG entropy stream")
            b = self._d[self._pos]
            self._pos += 1
            if b == 0xFF:
                if self._pos >= len(self._d) or self._d[self._pos] != 0x00:
                    raise ValueError("unexpected marker in entropy stream")
                self._pos += 1  # skip the stuffed 0x00
            self._acc = (self._acc << 8) | b
            self._n += 8
        out = (self._acc >> (self._n - n)) & ((1 << n) - 1)
        self._n -= n
        self._acc &= (1 << self._n) - 1
        return out


class _HuffDecoder:
    """Canonical table decoder: (min_code, max_code, first_index) per
    length — the T.81 DECODE procedure (F.2.2.3)."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self._vals = vals
        self._min: list[int] = []
        self._max: list[int] = []
        self._idx: list[int] = []
        code = 0
        k = 0
        for length in range(1, 17):
            n = bits[length - 1]
            self._min.append(code)
            self._max.append(code + n - 1 if n else -1)
            self._idx.append(k)
            code = (code + n) << 1
            k += n

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read(1)
            if self._max[length - 1] >= 0 and code <= self._max[length - 1]:
                return self._vals[self._idx[length - 1] + code - self._min[length - 1]]
        raise ValueError("invalid Huffman code in JPEG stream")


def _magnitude(v: int) -> tuple[int, int]:
    """(category, extra bits) for a DC diff / AC value (T.81 F.1.2.1)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    extra = v if v > 0 else v + (1 << cat) - 1
    return cat, extra


def _extend(extra: int, cat: int) -> int:
    """Inverse of _magnitude (the EXTEND procedure)."""
    if cat == 0:
        return 0
    if extra < (1 << (cat - 1)):
        return extra - (1 << cat) + 1
    return extra


# ---- encoder ----------------------------------------------------------------


def _encode_block(
    bw: _BitWriter,
    coef: np.ndarray,
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    zz = coef.reshape(-1)[ZZ_FLAT]
    diff = int(zz[0]) - pred
    cat, extra = _magnitude(diff)
    code, ln = dc_codes[cat]
    bw.put(code, ln)
    if cat:
        bw.put(extra, cat)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL: 16 zeros
            bw.put(code, ln)
            run -= 16
        cat, extra = _magnitude(v)
        code, ln = ac_codes[(run << 4) | cat]
        bw.put(code, ln)
        bw.put(extra, cat)
        run = 0
        if i == last_nz:
            break
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.put(code, ln)
    return int(zz[0])


def _dqt_segment(tid: int, q: np.ndarray) -> bytes:
    body = bytes([tid]) + bytes(int(v) for v in q.reshape(-1)[ZZ_FLAT])
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def _dht_segment(tc: int, th: int, spec: tuple[list[int], list[int]]) -> bytes:
    bits, vals = spec
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    """JFIF fixed-point (2^16) integer transform, round half away."""
    r = arr[..., 0].astype(np.int64)
    g = arr[..., 1].astype(np.int64)
    b = arr[..., 2].astype(np.int64)
    s = 1 << 16

    def fx(f: float) -> int:
        return int(round(f * s))

    y = _round_div(fx(0.299) * r + fx(0.587) * g + fx(0.114) * b, np.int64(s))
    cb = _round_div(
        -fx(0.168736) * r - fx(0.331264) * g + fx(0.5) * b, np.int64(s)
    ) + 128
    cr = _round_div(
        fx(0.5) * r - fx(0.418688) * g - fx(0.081312) * b, np.int64(s)
    ) + 128
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(out, 0, 255)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    s = 1 << 16

    def fx(f: float) -> int:
        return int(round(f * s))

    y = y.astype(np.int64)
    cb = cb.astype(np.int64) - 128
    cr = cr.astype(np.int64) - 128
    r = y + _round_div(fx(1.402) * cr, np.int64(s))
    g = y - _round_div(fx(0.344136) * cb + fx(0.714136) * cr, np.int64(s))
    b = y + _round_div(fx(1.772) * cb, np.int64(s))
    out = np.stack([r, g, b], axis=-1)
    return np.clip(out, 0, 255).astype(np.uint8)


def encode_jpeg(arr: np.ndarray, gray: bool | None = None) -> bytes:
    """uint8[h, w] or [h, w, 3] -> baseline JFIF bytes.

    ``gray=None`` infers from shape (2-D, or 3-D whose channels are
    identical, encodes as 1-component). Edges of non-multiple-of-8
    images are replicate-padded into the partial MCU (the standard
    practice; SOF carries the true dimensions and decode crops)."""
    a = np.asarray(arr)
    if a.ndim == 3 and a.shape[2] == 3:
        if gray is None:
            gray = bool(np.all(a[..., 0] == a[..., 1]) and np.all(a[..., 1] == a[..., 2]))
        comps = (
            [a[..., 0].astype(np.int64)]
            if gray
            else [c.astype(np.int64) for c in np.moveaxis(_rgb_to_ycbcr(a), -1, 0)]
        )
    elif a.ndim == 2:
        gray = True
        comps = [a.astype(np.int64)]
    else:
        raise ValueError(f"encode_jpeg needs [h,w] or [h,w,3], got {a.shape}")
    h, w = a.shape[0], a.shape[1]
    n_comp = 1 if gray else 3

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0 / JFIF 1.02, no thumbnail, 1:1 aspect
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    out += _dqt_segment(0, Q_LUMA)
    if n_comp == 3:
        out += _dqt_segment(1, Q_CHROMA)
    # SOF0: precision 8, dims, components (id, sampling 1x1, qtable)
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([n_comp])
    for ci in range(n_comp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + bytes(sof)
    out += _dht_segment(0, 0, DC_LUMA) + _dht_segment(1, 0, AC_LUMA)
    if n_comp == 3:
        out += _dht_segment(0, 1, DC_CHROMA) + _dht_segment(1, 1, AC_CHROMA)
    sos = bytes([n_comp]) + b"".join(
        bytes([ci + 1, 0x00 if ci == 0 else 0x11]) for ci in range(n_comp)
    ) + b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_codes = [_canonical_codes(*DC_LUMA), _canonical_codes(*DC_CHROMA)]
    ac_codes = [_canonical_codes(*AC_LUMA), _canonical_codes(*AC_CHROMA)]
    qts = [Q_LUMA, Q_CHROMA]

    bw = _BitWriter()
    mcu_h, mcu_w = -(-h // 8), -(-w // 8)
    pred = [0] * n_comp
    for by in range(mcu_h):
        for bx in range(mcu_w):
            for ci in range(n_comp):
                plane = comps[ci]
                block = np.full((8, 8), 0, dtype=np.int64)
                ys = slice(by * 8, min(by * 8 + 8, h))
                xs = slice(bx * 8, min(bx * 8 + 8, w))
                sub = plane[ys, xs]
                block[: sub.shape[0], : sub.shape[1]] = sub
                # replicate-pad partial MCUs
                if sub.shape[0] < 8:
                    block[sub.shape[0] :, : sub.shape[1]] = sub[-1:, :]
                if sub.shape[1] < 8:
                    block[:, sub.shape[1] :] = block[:, sub.shape[1] - 1 : sub.shape[1]]
                t = 0 if ci == 0 else 1
                coef = _fdct_quant(block - 128, qts[t])
                pred[ci] = _encode_block(
                    bw, coef, pred[ci], dc_codes[t], ac_codes[t]
                )
    out += bw.done()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---- decoder ----------------------------------------------------------------


def decode_jpeg(content: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8[h, w, 3] (grayscale replicated).

    Reads the stream's own DQT/DHT; rejects progressive (SOF2),
    arithmetic coding, subsampling, restart markers, and 12-bit
    precision with a clear error (this codec's declared scope is
    baseline 8-bit 1x1)."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    h = w = 0
    comps: list[tuple[int, int]] = []  # (component id, qtable id)
    scan: list[tuple[int, int, int]] = []  # (comp index, dc table, ac table)
    data_start = -1
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = content[pos + 1]
        if marker == 0xD9:  # EOI
            break
        ln = struct.unpack(">H", content[pos + 2 : pos + 4])[0]
        seg = content[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZZ_FLAT] = np.frombuffer(
                    seg[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int64)
                qt[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h, w = struct.unpack(">HH", seg[1:5])
            n_comp = seg[5]
            comps = []
            for ci in range(n_comp):
                cid, samp, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise ValueError("chroma subsampling unsupported (need 1x1)")
                comps.append((cid, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            for si in range(ns):
                cid, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                idx = next(i for i, (c, _) in enumerate(comps) if c == cid)
                scan.append((idx, tt >> 4, tt & 0xF))
            data_start = pos + 2 + ln
            break
        pos += 2 + ln
    if data_start < 0 or not comps:
        raise ValueError("no SOS/SOF in JPEG stream")

    br = _BitReader(content[data_start:])
    n_comp = len(comps)
    mcu_h, mcu_w = -(-h // 8), -(-w // 8)
    planes = [np.zeros((mcu_h * 8, mcu_w * 8), dtype=np.uint8) for _ in comps]
    pred = [0] * n_comp
    for by in range(mcu_h):
        for bx in range(mcu_w):
            for (ci, dc_t, ac_t) in scan:
                dc_dec, ac_dec = huff[(0, dc_t)], huff[(1, ac_t)]
                zz = np.zeros(64, dtype=np.int64)
                cat = dc_dec.decode(br)
                pred[ci] += _extend(br.read(cat), cat) if cat else 0
                zz[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = ac_dec.decode(br)
                    run, cat = rs >> 4, rs & 0xF
                    if cat == 0:
                        if run == 15:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += run
                    if k > 63:
                        raise ValueError("AC run past block end")
                    zz[k] = _extend(br.read(cat), cat)
                    k += 1
                coef = np.zeros(64, dtype=np.int64)
                coef[ZZ_FLAT] = zz
                block = _dequant_idct(coef.reshape(8, 8), qt[comps[ci][1]])
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    planes = [p[:h, :w] for p in planes]
    if n_comp == 1:
        g = planes[0]
        return np.stack([g, g, g], axis=-1)
    if n_comp == 3:
        return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
    raise ValueError(f"unsupported component count {n_comp}")


# ---- exact-round-trip tiles (the certification surface) ---------------------
#
# Quantization maps F -> round(F / Q); it is EXACT when F is an exact
# multiple of Q. Build tiles as the integer IDCT of chosen quantized
# coefficient matrices (DC + a few AC structures at positions whose
# quant steps are small enough to keep pixels in gamut), then keep only
# those that (a) round-trip encode->decode bit-exactly and (b) stay
# exact under every DC pixel offset the synthesis adds (+2k: the DC
# coefficient moves by 16k = k luma quant steps, which the linear
# integer transform carries exactly; verified, not assumed).

N_TILE_OFFSETS = 29  # synthesis offsets: +2 * (doc_id % 29) -> 0..56


def _candidate_coefs() -> list[np.ndarray]:
    cands = []
    # DC-only (flat) tile
    c = np.zeros((8, 8), dtype=np.int64)
    c[0, 0] = -8
    cands.append(c)
    # low-frequency horizontal + vertical AC
    c = np.zeros((8, 8), dtype=np.int64)
    c[0, 0] = -10
    c[0, 1] = 3
    c[1, 0] = -2
    cands.append(c)
    # diagonal + mid-frequency structure
    c = np.zeros((8, 8), dtype=np.int64)
    c[0, 0] = -12
    c[1, 1] = 2
    c[2, 0] = 1
    c[0, 3] = 1
    cands.append(c)
    # high-frequency checkerboard-ish (exercises ZRL/long runs)
    c = np.zeros((8, 8), dtype=np.int64)
    c[0, 0] = -6
    c[7, 7] = 1
    cands.append(c)
    c = np.zeros((8, 8), dtype=np.int64)
    c[0, 0] = -14
    c[0, 2] = -2
    c[3, 0] = 1
    c[5, 5] = 1
    cands.append(c)
    c = np.zeros((8, 8), dtype=np.int64)
    c[0, 0] = -9
    c[1, 0] = 3
    c[0, 1] = -3
    c[2, 2] = 1
    cands.append(c)
    return cands


def _derive_exact_tiles() -> list[np.ndarray]:
    tiles = []
    for coef in _candidate_coefs():
        tile = _dequant_idct(coef, Q_LUMA)  # uint8 8x8
        if tile.min() < 1 or tile.max() > 255 - 2 * (N_TILE_OFFSETS - 1):
            continue  # offset headroom: +56 must not clip
        ok = True
        for off in range(N_TILE_OFFSETS):
            img = (tile.astype(np.int64) + 2 * off).astype(np.uint8)
            if not np.array_equal(
                decode_jpeg(encode_jpeg(img))[:, :, 0], img
            ):
                ok = False
                break
        if ok:
            tiles.append(tile)
    if len(tiles) < 4:
        raise AssertionError(
            "JPEG exact-tile derivation degraded: expected >= 4 verified "
            f"round-trip-exact tiles, got {len(tiles)} — the codec or the "
            "candidate set changed in a way that breaks the certification"
        )
    return tiles


EXACT_TILES: list[np.ndarray] = _derive_exact_tiles()
N_EXACT_TILES = len(EXACT_TILES)


def exact_tile_pixels(doc_id: int) -> np.ndarray:
    """The certified synthesis: uint8[8, 8] grayscale image for one doc
    (tile cycles with doc_id, DC offset +2 * (doc_id % 29)). Every
    (tile, offset) pair was verified round-trip-exact at import."""
    tile = EXACT_TILES[doc_id % N_EXACT_TILES]
    return (tile.astype(np.int64) + 2 * (doc_id % N_TILE_OFFSETS)).astype(
        np.uint8
    )
