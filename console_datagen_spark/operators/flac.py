"""FLAC codec (lossless audio) — pure numpy + stdlib, no audio library.

Closes the last closable audio-format gap (VERDICT r12 #6, widened per
VERDICT r13 #3): unlike MP3/Vorbis, FLAC is LOSSLESS and fully integer —
LPC/fixed prediction plus Rice/Golomb residual coding, no float anywhere
in the spec's decode path (RFC 9639 / the classic flac format doc) — so,
exactly like the PNG/JPEG/WAV closures before it, a real codec can be
certified end-to-end: synthesize samples from the md5 chain, encode,
decode, decimate, re-encode, and replay the sample math in SQL.

Implemented surface (spec-correct bytes; any standard FLAC decoder reads
our streams, and our decoder rejects what it does not support LOUDLY):

- Stream: ``fLaC`` marker + STREAMINFO metadata block (34 bytes,
  including the MD5 of the raw interleaved little-endian sample bytes,
  which the decoder VERIFIES), then one or more audio frames.
- Frame header: sync ``0b11111111111110``, fixed-blocksize strategy,
  block-size code 0b0111 (16-bit "blocksize-1" at header end), sample
  rate code 0b1100 (8-bit kHz) or 0b1101/0b1110 (16-bit Hz / 10 Hz)
  fallback, UTF-8 coded frame number (multi-byte forms round-trip-
  tested), CRC-8 (poly 0x07).
- Channels: mono, independent stereo, and all three stereo
  decorrelation modes — left/side, right/side, mid/side — with the
  spec's bps+1 side-channel width, on BOTH encode and decode (the
  encoder picks the cheapest assignment per frame by exact bit cost).
- Subframes: CONSTANT, VERBATIM, FIXED orders 0-4, and LPC orders 1-32.
  Decode-side LPC is the coefficient reader + an exact integer FIR
  (arithmetic-shift accumulator per spec). Encode-side LPC quantizes
  Levinson-Durbin coefficients to integer precision-12/shift form —
  floats pick the PREDICTOR only; the emitted residuals and the decode
  path stay exact integer, so losslessness never depends on float.
- Residuals: Rice method 0 (4-bit parameter) and method 1 (5-bit), any
  partition order on decode (the encoder emits order 0); escape codes
  at any width INCLUDING the spec-legal width 0 (all-zero partition).
- Wasted-bits subframes (unary-coded shift) on decode.
- Frame footer CRC-16 (poly 0x8005), verified on decode.
- Multi-frame streams: ``encode_flac(..., block_size=...)`` splits into
  sequentially-numbered fixed-blocksize frames; decode walks frames
  until STREAMINFO's total and verifies the frame-number sequence.

Out of scope (documented permanent N/As, SURVEY §8): >2 channels,
non-16-bit source depth, MP3/MP4/Vorbis (lossy entropy codecs — a codec
LIBRARY, not a byte layout).

Scale shape: identical to wav.py/jpeg.py — called from Arrow-batched
``mapInPandas`` kernels on per-row payloads, embarrassingly parallel,
no shuffle, no driver involvement.

Reference anchor: north-star multimodal scope (the reference
streamshub/console-datagen is a Kafka load generator with no media
path; this tier exists for the 100 TB training-data pipeline).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_CRC8_POLY = 0x07
_CRC16_POLY = 0x8005


def _make_crc8_table() -> list[int]:
    table = []
    for b in range(256):
        crc = b
        for _ in range(8):
            crc = (
                ((crc << 1) ^ _CRC8_POLY) & 0xFF
                if crc & 0x80
                else (crc << 1) & 0xFF
            )
        table.append(crc)
    return table


def _make_crc16_table() -> list[int]:
    table = []
    for b in range(256):
        crc = b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ _CRC16_POLY) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
        table.append(crc)
    return table


_CRC8_TABLE = _make_crc8_table()
_CRC16_TABLE = _make_crc16_table()


def _crc8(data: bytes) -> int:
    crc = 0
    t = _CRC8_TABLE
    for b in data:
        crc = t[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    t = _CRC16_TABLE
    for b in data:
        crc = t[((crc >> 8) ^ b) & 0xFF] ^ ((crc << 8) & 0xFFFF)
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self._bytes = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits < 0 or (nbits < 64 and value >> nbits):
            raise ValueError(f"value {value} does not fit in {nbits} bits")
        self._acc = (self._acc << nbits) | value
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self._bytes.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        # q zero bits then a one bit (Rice quotient)
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def write_bytes(self, data: bytes) -> None:
        """Bulk byte append — requires byte alignment (the verbatim
        fast path: a byte-aligned subframe start + the 8-bit subframe
        header leave the sample block aligned, so int16 samples go in
        as one numpy tobytes)."""
        if self._nbits:
            raise ValueError("write_bytes on an unaligned stream")
        self._bytes.extend(data)

    def aligned(self) -> bool:
        return self._nbits == 0

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def getvalue(self) -> bytes:
        if self._nbits:
            raise ValueError("unaligned bit stream")
        return bytes(self._bytes)


class _BitReader:
    """MSB-first bit reader over an unpacked bit array.

    np.unpackbits once up front, then ``read`` is one small dot product
    and ``read_unary`` one argmax — the per-bit Python loop this
    replaces made FLAC decode the bench's slowest kernel (14.7 s at
    sf0.1; the codec passes per doc are decode + re-encode + re-decode,
    each a few thousand bits)."""

    # widest single read is STREAMINFO's 36-bit total; cap at 40
    _MAXREAD = 40
    _POW2 = np.array([1 << i for i in range(39, -1, -1)], dtype=np.int64)

    def __init__(self, data: bytes, pos_bytes: int = 0) -> None:
        self._bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self._pos = pos_bytes * 8

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        if nbits > self._MAXREAD:
            raise ValueError(f"read({nbits}) exceeds {self._MAXREAD}-bit cap")
        p = self._pos
        self._pos = p + nbits
        if self._pos > len(self._bits):
            raise ValueError("bit stream truncated")
        return int(
            self._bits[p : p + nbits] @ self._POW2[self._MAXREAD - nbits :]
        )

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >= (1 << (nbits - 1)) else v

    def read_unary(self) -> int:
        p = self._pos
        bits = self._bits
        if p >= len(bits):
            raise ValueError("bit stream truncated")
        # argmax finds the first 1; all-zero tail would return 0, so
        # verify the bit found is actually set
        q = int(np.argmax(bits[p:]))
        if not bits[p + q]:
            raise ValueError("bit stream truncated in unary run")
        self._pos = p + q + 1
        return q

    def read_i16_block(self, n: int) -> np.ndarray:
        """Bulk big-endian int16 read — requires byte alignment (the
        verbatim fast path, mirroring write_bytes)."""
        if self._pos & 7:
            raise ValueError("read_i16_block on an unaligned stream")
        p = self._pos >> 3
        self._pos += 16 * n
        if self._pos > len(self._bits):
            raise ValueError("bit stream truncated")
        raw = np.packbits(self._bits[p * 8 : p * 8 + 16 * n])
        return raw.view(">i2").astype(np.int64)

    def byte_aligned(self) -> bool:
        return (self._pos & 7) == 0

    def align(self) -> None:
        self._pos = (self._pos + 7) & ~7

    def byte_pos(self) -> int:
        return self._pos >> 3


# ---- fixed predictors (spec orders 0-4) ------------------------------------

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fixed_residual(samples: np.ndarray, order: int) -> np.ndarray:
    r = samples.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)  # order-n fixed residual = n-th difference
    return r


def _restore_fixed(order: int, warmup: list[int], residual: list[int]) -> list[int]:
    """Invert _fixed_residual given the first ``order`` raw samples."""
    out = list(warmup)
    coefs = _FIXED_COEFS[order]
    for r in residual:
        pred = sum(c * out[-1 - i] for i, c in enumerate(coefs))
        out.append(pred + r)
    return out


def _restore_lpc(
    warmup: list[int], coefs: list[int], shift: int, residual: list[int]
) -> list[int]:
    """Exact integer LPC reconstruction (RFC 9639 §9.2.4): the predictor
    is an integer FIR over prior OUTPUT samples, accumulated in unbounded
    Python ints and arithmetic-shifted right — Python's ``>>`` on
    negative ints is the floor shift the spec requires."""
    out = list(warmup)
    order = len(coefs)
    for r in residual:
        acc = 0
        for i in range(order):
            acc += coefs[i] * out[-1 - i]
        out.append((acc >> shift) + r)
    return out


# ---- Rice coding ------------------------------------------------------------


def _rice_param(residual: np.ndarray) -> int:
    """Smallest k with mean(|zigzag|) < 2^k — the standard estimator."""
    if len(residual) == 0:
        return 0
    z = np.abs(residual.astype(np.int64)) * 2
    mean = int(z.mean()) + 1
    k = 0
    while (1 << k) < mean and k < 14:
        k += 1
    return k


def _rice_cost(residual: np.ndarray, k: int) -> int:
    if len(residual) == 0:
        return 0
    z = np.where(residual >= 0, 2 * residual, -2 * residual - 1)
    return int((z >> k).sum()) + (k + 1) * len(residual)


def _write_rice(w: _BitWriter, residual: np.ndarray, k: int) -> None:
    for r in residual.tolist():
        u = (2 * r) if r >= 0 else (-2 * r - 1)  # zigzag
        w.write_unary(u >> k)
        if k:
            w.write(u & ((1 << k) - 1), k)


def _read_rice(rd: _BitReader, n: int, k: int) -> list[int]:
    out = []
    for _ in range(n):
        q = rd.read_unary()
        u = (q << k) | (rd.read(k) if k else 0)
        out.append((u >> 1) ^ -(u & 1))  # un-zigzag
    return out


# ---- UTF-8 coded frame number (spec: like UTF-8 but up to 36 bits) ----------


def _write_utf8_num(w: _BitWriter, v: int) -> None:
    if v < 0x80:
        w.write(v, 8)
        return
    # n-byte form carries 5n+1 payload bits (2 bytes -> 11, ... 7 -> 36)
    # and the lead byte is n ones then a zero: (0xFF << (8-n)) & 0xFF.
    # ADVICE r13: the previous spelling set one extra lead bit and used
    # a wrong capacity threshold — every v >= 128 failed to round-trip.
    nbytes = 2
    while v >= (1 << (5 * nbytes + 1)) and nbytes < 7:
        nbytes += 1
    if v >= (1 << (5 * nbytes + 1)):
        raise ValueError(f"frame number {v} exceeds the 36-bit UTF-8 form")
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    w.write(lead | (v >> shift), 8)
    for _ in range(nbytes - 1):
        shift -= 6
        w.write(0x80 | ((v >> shift) & 0x3F), 8)


def _read_utf8_num(rd: _BitReader) -> int:
    b0 = rd.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    v = b0 & (mask - 1)
    for _ in range(n):
        cont = rd.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 coded number in frame header")
        v = (v << 6) | (cont & 0x3F)
    return v


# ---- subframe planning (encoder) --------------------------------------------

# A subframe "plan" is (cost_bits, kind, payload):
#   ("const", value)                      CONSTANT
#   ("verbatim", samples)                 VERBATIM
#   ("fixed", order, residual)            FIXED + Rice order-0 partition
#   ("lpc", order, precision, shift, coefs, residual)


def _quantize_lpc(a: np.ndarray, order: int, precision: int = 12):
    """Levinson-Durbin + coefficient quantization. Floats choose the
    predictor ONLY — residuals are recomputed with the quantized integer
    coefficients, so encode/decode round-trips exactly regardless of any
    float nondeterminism. Returns (coefs, shift) or None when the signal
    is degenerate (zero autocorrelation / unstable recursion)."""
    x = a.astype(np.float64)
    n = len(x)
    if n <= order:
        return None
    autoc = np.array(
        [float(np.dot(x[: n - lag], x[lag:])) for lag in range(order + 1)]
    )
    if autoc[0] <= 0:
        return None
    err = autoc[0]
    lpc = np.zeros(order)
    for i in range(order):
        acc = autoc[i + 1] - np.dot(lpc[:i], autoc[i:0:-1])
        if err <= 0:
            return None
        k = acc / err
        lpc[: i + 1] = np.concatenate([lpc[:i] - k * lpc[:i][::-1], [k]])
        err *= 1.0 - k * k
    cmax = float(np.max(np.abs(lpc)))
    if not np.isfinite(cmax) or cmax <= 0:
        return None
    # largest shift keeping every coef inside the signed `precision` range
    shift = precision - 1
    while shift > 0 and cmax * (1 << shift) >= (1 << (precision - 1)):
        shift -= 1
    if shift <= 0:
        return None
    lim = 1 << (precision - 1)
    coefs = np.clip(np.round(lpc * (1 << shift)), -lim, lim - 1).astype(int)
    if not np.any(coefs):
        return None
    return coefs.tolist(), shift


def _lpc_residual(a: np.ndarray, coefs: list[int], shift: int) -> np.ndarray:
    """Exact integer LPC residual via a vectorized correlate (int64 is
    safe: |acc| <= order * 2^(precision-1) * 2^17 < 2^35)."""
    c = np.array(coefs, dtype=np.int64)
    order = len(c)
    x = a.astype(np.int64)
    # prediction for sample i (i >= order): sum_j c[j] * x[i-1-j]
    pred = np.correlate(x, c[::-1].astype(np.int64), mode="valid")[:-1]
    return x[order:] - (pred >> shift)


_LPC_PRECISION = 12


def _plan_subframe(a: np.ndarray, bps: int) -> tuple[int, tuple]:
    """Best-of CONSTANT / FIXED 0-4 / LPC-8 / VERBATIM by exact bit cost."""
    n = len(a)
    if np.all(a == a[0]):
        return 8 + bps, ("const", int(a[0]))
    best_cost = 8 + n * bps  # verbatim
    best: tuple = ("verbatim", a)
    for order in range(0, min(5, n)):
        res = _fixed_residual(a, order)
        if len(res) == 0 or np.max(np.abs(res)) > (1 << 40):
            continue  # keep unary lengths sane
        k = _rice_param(res)
        cost = 8 + bps * order + 2 + 4 + 4 + _rice_cost(res, k)
        if cost < best_cost:
            best_cost, best = cost, ("fixed", order, res)
    lpc_order = 8
    if n > 2 * lpc_order:
        q = _quantize_lpc(a, lpc_order, _LPC_PRECISION)
        if q is not None:
            coefs, shift = q
            res = _lpc_residual(a, coefs, shift)
            if len(res) and np.max(np.abs(res)) <= (1 << 40):
                k = _rice_param(res)
                cost = (
                    8
                    + bps * lpc_order
                    + 4
                    + 5
                    + _LPC_PRECISION * lpc_order
                    + 2
                    + 4
                    + 4
                    + _rice_cost(res, k)
                )
                if cost < best_cost:
                    best_cost = cost
                    best = ("lpc", lpc_order, _LPC_PRECISION, shift, coefs, res)
    return best_cost, best


def _emit_residual(w: _BitWriter, res: np.ndarray) -> None:
    k = _rice_param(res)
    w.write(0b00, 2)  # residual method: 4-bit Rice
    w.write(0, 4)  # partition order 0
    w.write(k, 4)
    _write_rice(w, res, k)


def _emit_subframe(w: _BitWriter, a: np.ndarray, bps: int, plan: tuple) -> None:
    kind = plan[0]
    w.write(0, 1)  # zero padding bit
    if kind == "const":
        w.write(0b000000, 6)
        w.write(0, 1)  # no wasted bits
        w.write_signed(plan[1], bps)
    elif kind == "verbatim":
        w.write(0b000001, 6)
        w.write(0, 1)
        if bps == 16 and w.aligned():
            # 8 header bits on a byte-aligned start: bulk big-endian block
            w.write_bytes(a.astype(">i2").tobytes())
        else:
            for v in a.tolist():
                w.write_signed(int(v), bps)
    elif kind == "fixed":
        _, order, res = plan
        w.write(0b001000 | order, 6)
        w.write(0, 1)
        for v in a[:order].tolist():
            w.write_signed(int(v), bps)  # warmup
        _emit_residual(w, res)
    elif kind == "lpc":
        _, order, precision, shift, coefs, res = plan
        w.write(0b100000 | (order - 1), 6)
        w.write(0, 1)
        for v in a[:order].tolist():
            w.write_signed(int(v), bps)  # warmup
        w.write(precision - 1, 4)
        w.write(shift, 5)  # spec: 5-bit signed, but negative is forbidden
        for c in coefs:
            w.write_signed(int(c), precision)
        _emit_residual(w, res)
    else:  # pragma: no cover
        raise AssertionError(f"unknown subframe plan {kind}")


# ---- channel decorrelation ---------------------------------------------------

# frame-header channel codes (RFC 9639 table): value -> (n_ch, mode)
_CH_MONO = 0b0000
_CH_STEREO = 0b0001
_CH_LEFT_SIDE = 0b1000
_CH_RIGHT_SIDE = 0b1001
_CH_MID_SIDE = 0b1010


def _stereo_candidates(left: np.ndarray, right: np.ndarray):
    """The four assignment candidates as (code, [(samples, bps), ...])."""
    l64 = left.astype(np.int64)
    r64 = right.astype(np.int64)
    side = l64 - r64
    mid = (l64 + r64) >> 1
    return [
        (_CH_STEREO, [(l64, 16), (r64, 16)]),
        (_CH_LEFT_SIDE, [(l64, 16), (side, 17)]),
        (_CH_RIGHT_SIDE, [(side, 17), (r64, 16)]),
        (_CH_MID_SIDE, [(mid, 16), (side, 17)]),
    ]


# ---- encoder ----------------------------------------------------------------

_MAX_BLOCK = 65536


_CHANNEL_MODES = {
    "independent": _CH_STEREO,
    "left_side": _CH_LEFT_SIDE,
    "right_side": _CH_RIGHT_SIDE,
    "mid_side": _CH_MID_SIDE,
}


def encode_flac(
    samples: np.ndarray,
    rate: int = 16_000,
    block_size: int | None = None,
    channel_mode: str | None = None,
) -> bytes:
    """int16 samples -> FLAC bytes.

    ``samples``: 1-D array (mono) or 2-D shape ``(2, n)`` channels-first
    (stereo). Every subframe is the exact-bit-cost best of CONSTANT /
    FIXED 0-4 / quantized-Levinson LPC-8 / VERBATIM; stereo frames pick
    the cheapest of the four channel assignments unless ``channel_mode``
    pins one ('independent' / 'left_side' / 'right_side' / 'mid_side' —
    the flac CLI's -M surface; the spec tests pin each decode path with
    it). ``block_size=None`` emits one frame (n <= 65536); otherwise the
    stream splits into sequentially numbered ``block_size`` frames (last
    may be short)."""
    a = np.asarray(samples, dtype=np.int64)
    if a.ndim == 1:
        channels = [a]
    elif a.ndim == 2 and a.shape[0] in (1, 2):
        channels = [a[i] for i in range(a.shape[0])]
    else:
        raise ValueError(f"samples must be 1-D or (2, n), got shape {a.shape}")
    n = channels[0].shape[0]
    n_ch = len(channels)
    if any(c.shape[0] != n for c in channels):
        raise ValueError("channel length mismatch")
    if n < 1:
        raise ValueError("need at least 1 sample")
    for c in channels:
        if c.min() < -32768 or c.max() > 32767:
            raise ValueError("samples out of int16 range")
    if block_size is None:
        if n > _MAX_BLOCK:
            raise ValueError(
                f"single-frame encode supports <= {_MAX_BLOCK} samples, "
                f"got {n}; pass block_size to split"
            )
        block_size = n
    if not (1 <= block_size <= _MAX_BLOCK):
        raise ValueError(f"block_size {block_size} out of range")

    interleaved = np.stack(channels, axis=1).reshape(-1).astype("<i2")
    md5 = hashlib.md5(interleaved.tobytes()).digest()

    # STREAMINFO: min/max blocksize (the last short frame is excluded
    # from "min" per spec), min/max framesize (0 = unknown),
    # rate(20) ch-1(3) bps-1(5) total(36), md5(16)
    si = _BitWriter()
    si.write(min(block_size, n), 16)
    si.write(min(block_size, n), 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(n_ch - 1, 3)
    si.write(15, 5)  # 16 bps
    si.write(n, 36)
    streaminfo = si.getvalue() + md5
    out = bytearray(b"fLaC" + bytes([0x80, 0, 0, 34]) + streaminfo)

    if rate % 1000 == 0 and rate // 1000 < 256:
        rate_code, rate_tail = 0b1100, (rate // 1000, 8)
    elif rate < 65536:
        rate_code, rate_tail = 0b1101, (rate, 16)
    elif rate % 10 == 0 and rate // 10 < 65536:
        rate_code, rate_tail = 0b1110, (rate // 10, 16)
    else:
        raise ValueError(f"sample rate {rate} not encodable")

    for frame_no, start in enumerate(range(0, n, block_size)):
        chunk = [c[start : start + block_size] for c in channels]
        bs = chunk[0].shape[0]
        if n_ch == 1:
            if channel_mode is not None:
                raise ValueError("channel_mode only applies to stereo input")
            ch_code, parts = _CH_MONO, [(chunk[0], 16)]
        else:
            cands = _stereo_candidates(chunk[0], chunk[1])
            if channel_mode is not None:
                want = _CHANNEL_MODES.get(channel_mode)
                if want is None:
                    raise ValueError(
                        f"unknown channel_mode {channel_mode!r}; pick one of "
                        f"{sorted(_CHANNEL_MODES)}"
                    )
                cands = [c for c in cands if c[0] == want]
            costed = [
                (sum(_plan_subframe(s, b)[0] for s, b in parts), code, parts)
                for code, parts in cands
            ]
            _, ch_code, parts = min(costed, key=lambda t: t[0])

        fh = _BitWriter()
        fh.write(0b11111111111110, 14)
        fh.write(0, 1)  # reserved
        fh.write(0, 1)  # fixed blocksize strategy
        fh.write(0b0111, 4)  # blocksize: 16-bit value-1 at end of header
        fh.write(rate_code, 4)
        fh.write(ch_code, 4)
        fh.write(0b100, 3)  # sample size: 16 bit
        fh.write(0, 1)  # reserved
        _write_utf8_num(fh, frame_no)
        fh.write(bs - 1, 16)
        fh.write(rate_tail[0], rate_tail[1])
        head = fh.getvalue()
        head += bytes([_crc8(head)])

        body = _BitWriter()
        for s, bps in parts:
            _, plan = _plan_subframe(s, bps)
            _emit_subframe(body, s, bps, plan)
        body.align()
        frame = head + body.getvalue()
        frame += struct.pack(">H", _crc16(frame))
        out.extend(frame)
    return bytes(out)


def craft_lpc_stream(
    samples: np.ndarray,
    coefs: list[int],
    shift: int,
    precision: int = 12,
    rate: int = 16_000,
) -> bytes:
    """Explicit-coefficient LPC encoder: a spec-correct mono single-frame
    stream whose only subframe is LPC with the GIVEN quantized predictor.
    Used by the spec tests to pin decode-side LPC against hand-chosen
    coefficient sets (including ones the cost-driven encoder would never
    pick); also the interop hook for external coefficient tables."""
    a = np.asarray(samples, dtype=np.int64).ravel()
    order = len(coefs)
    if not (1 <= order <= 32):
        raise ValueError("LPC order must be 1..32")
    if len(a) <= order:
        raise ValueError("need more samples than the LPC order")
    if not (0 <= shift <= 15):
        raise ValueError("shift must be 0..15")
    lim = 1 << (precision - 1)
    if any(c < -lim or c >= lim for c in coefs):
        raise ValueError("coefficient exceeds the signed precision range")
    res = _lpc_residual(a, list(coefs), shift)
    if np.max(np.abs(res)) > (1 << 40):
        raise ValueError("residuals too large for sane unary lengths")

    md5 = hashlib.md5(a.astype("<i2").tobytes()).digest()
    si = _BitWriter()
    si.write(len(a), 16)
    si.write(len(a), 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(0, 3)
    si.write(15, 5)
    si.write(len(a), 36)
    header = b"fLaC" + bytes([0x80, 0, 0, 34]) + si.getvalue() + md5

    fh = _BitWriter()
    fh.write(0b11111111111110, 14)
    fh.write(0, 2)
    fh.write(0b0111, 4)
    fh.write(0b1101, 4)  # 16-bit Hz tail
    fh.write(_CH_MONO, 4)
    fh.write(0b100, 3)
    fh.write(0, 1)
    _write_utf8_num(fh, 0)
    fh.write(len(a) - 1, 16)
    fh.write(rate, 16)
    head = fh.getvalue()
    head += bytes([_crc8(head)])

    body = _BitWriter()
    plan = ("lpc", order, precision, shift, list(coefs), res)
    _emit_subframe(body, a, 16, plan)
    body.align()
    frame = head + body.getvalue()
    frame += struct.pack(">H", _crc16(frame))
    return header + frame


# ---- decoder ----------------------------------------------------------------


def _read_residuals(rd: _BitReader, n: int, order: int) -> list[int]:
    """Coded residual section shared by FIXED and LPC subframes: methods
    0 (4-bit Rice, escape 0b1111) and 1 (5-bit Rice, escape 0b11111),
    any partition order, escape widths including the spec-legal 0."""
    method = rd.read(2)
    if method not in (0, 1):
        raise ValueError(f"unsupported residual method {method}")
    kbits = 4 if method == 0 else 5
    escape = (1 << kbits) - 1
    part_order = rd.read(4)
    n_parts = 1 << part_order
    if part_order and n % n_parts:
        raise ValueError("blocksize not divisible by residual partitions")
    residual: list[int] = []
    for p in range(n_parts):
        k = rd.read(kbits)
        cnt = (n >> part_order) - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("predictor order exceeds first partition")
        if k == escape:  # escape: fixed-width verbatim residuals
            width = rd.read(5)
            if width == 0:
                # spec-legal all-zero partition (ADVICE r13: the previous
                # 1 << (width-1) spelling crashed on it)
                residual.extend([0] * cnt)
            else:
                for _ in range(cnt):
                    u = rd.read(width)
                    half = 1 << (width - 1)
                    residual.append(u - (1 << width) if u >= half else u)
        else:
            residual.extend(_read_rice(rd, cnt, k))
    return residual


def _read_subframe(rd: _BitReader, n: int, bps: int) -> list[int]:
    if rd.read(1) != 0:
        raise ValueError("bad subframe padding bit")
    sf_type = rd.read(6)
    wasted = 0
    if rd.read(1):
        wasted = rd.read_unary() + 1  # unary-coded "wasted bits - 1"
    eff = bps - wasted
    if eff < 1:
        raise ValueError("wasted bits exceed sample width")
    if sf_type == 0b000000:  # CONSTANT
        samples = [rd.read_signed(eff)] * n
    elif sf_type == 0b000001:  # VERBATIM
        if eff == 16 and rd.byte_aligned():
            samples = rd.read_i16_block(n).tolist()
        else:
            samples = [rd.read_signed(eff) for _ in range(n)]
    elif 0b001000 <= sf_type <= 0b001100:  # FIXED order 0-4
        order = sf_type & 0x07
        warmup = [rd.read_signed(eff) for _ in range(order)]
        samples = _restore_fixed(order, warmup, _read_residuals(rd, n, order))
    elif sf_type >= 0b100000:  # LPC order 1-32
        order = (sf_type & 0x1F) + 1
        warmup = [rd.read_signed(eff) for _ in range(order)]
        precision = rd.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision code 15")
        shift = rd.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift is forbidden")
        coefs = [rd.read_signed(precision) for _ in range(order)]
        samples = _restore_lpc(
            warmup, coefs, shift, _read_residuals(rd, n, order)
        )
    else:
        raise ValueError(f"unsupported/reserved subframe type {sf_type:#08b}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(content: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> (samples, rate). Mono returns a 1-D int16 array;
    stereo returns shape ``(2, n)`` channels-first. Walks every frame,
    verifies each frame's CRC-8/CRC-16, the frame-number sequence, and
    the STREAMINFO interleaved-sample MD5; rejects unsupported features
    loudly rather than guessing."""
    if content[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (no fLaC marker)")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(content):
            raise ValueError("truncated metadata block list")
        hdr = content[pos]
        blen = int.from_bytes(content[pos + 1 : pos + 4], "big")
        btype = hdr & 0x7F
        if btype == 0:
            streaminfo = content[pos + 4 : pos + 4 + blen]
        elif btype == 127:
            raise ValueError("invalid metadata block type 127")
        pos += 4 + blen
        if hdr & 0x80:
            break
    if streaminfo is None or len(streaminfo) != 34:
        raise ValueError("missing/malformed STREAMINFO")
    si = _BitReader(streaminfo)
    si.read(16)  # min blocksize
    si.read(16)  # max blocksize
    si.read(24)
    si.read(24)
    rate = si.read(20)
    n_ch = si.read(3) + 1
    bps = si.read(5) + 1
    total = si.read(36)
    want_md5 = streaminfo[18:34]
    if n_ch not in (1, 2):
        raise ValueError(f"only mono/stereo FLAC supported ({n_ch} channels)")
    if bps != 16:
        raise ValueError(f"only 16-bit FLAC supported ({bps}-bit)")

    decoded: list[list[np.ndarray]] = [[] for _ in range(n_ch)]
    got = 0
    frame_no = 0
    rd = _BitReader(content, pos)
    while total == 0 or got < total:
        frame_start = rd.byte_pos()
        if rd.read(14) != 0b11111111111110:
            raise ValueError("bad frame sync")
        rd.read(1)
        blocking = rd.read(1)
        bs_code = rd.read(4)
        sr_code = rd.read(4)
        ch_code = rd.read(4)
        ss_code = rd.read(3)
        rd.read(1)
        if ss_code != 0b100:
            raise ValueError("only 16-bit sample-size code supported")
        num = _read_utf8_num(rd)
        if blocking == 0 and num != frame_no:
            raise ValueError(
                f"frame number {num} out of sequence (expected {frame_no})"
            )
        if bs_code == 0b0110:
            n = rd.read(8) + 1
        elif bs_code == 0b0111:
            n = rd.read(16) + 1
        elif 0b0010 <= bs_code <= 0b0101:
            n = 576 << (bs_code - 2)
        elif bs_code >= 0b1000:
            n = 256 << (bs_code - 8)
        else:
            raise ValueError(f"unsupported blocksize code {bs_code}")
        if sr_code == 0b1100:
            rd.read(8)
        elif sr_code in (0b1101, 0b1110):
            rd.read(16)
        elif sr_code == 0b0000:
            pass  # from STREAMINFO
        elif sr_code < 0b1100:
            pass  # table-coded rates carry no tail bits
        else:
            raise ValueError("invalid sample rate code 15")
        crc8_end = rd.byte_pos()
        if _crc8(content[frame_start:crc8_end]) != rd.read(8):
            raise ValueError("frame header CRC-8 mismatch")

        if ch_code == _CH_MONO:
            if n_ch != 1:
                raise ValueError("mono frame in a stereo stream")
            chans = [_read_subframe(rd, n, 16)]
        elif ch_code in (_CH_STEREO, _CH_LEFT_SIDE, _CH_RIGHT_SIDE, _CH_MID_SIDE):
            if n_ch != 2:
                raise ValueError("stereo frame in a mono stream")
            # the SIDE channel carries one extra bit per spec
            bps0 = 17 if ch_code == _CH_RIGHT_SIDE else 16
            bps1 = 16 if ch_code in (_CH_STEREO, _CH_RIGHT_SIDE) else 17
            s0 = _read_subframe(rd, n, bps0)
            s1 = _read_subframe(rd, n, bps1)
            if ch_code == _CH_STEREO:
                chans = [s0, s1]
            elif ch_code == _CH_LEFT_SIDE:
                chans = [s0, [left - side for left, side in zip(s0, s1)]]
            elif ch_code == _CH_RIGHT_SIDE:
                chans = [[side + right for side, right in zip(s0, s1)], s1]
            else:  # mid/side: mid2 = (mid << 1) | (side & 1)
                left = [
                    (((m << 1) | (s & 1)) + s) >> 1 for m, s in zip(s0, s1)
                ]
                right = [
                    (((m << 1) | (s & 1)) - s) >> 1 for m, s in zip(s0, s1)
                ]
                chans = [left, right]
        elif 0b0001 <= ch_code <= 0b0111:
            raise ValueError(f"{ch_code + 1}-channel FLAC not supported")
        else:
            raise ValueError(f"reserved channel assignment {ch_code:#06b}")

        rd.align()
        crc16_end = rd.byte_pos()
        if _crc16(content[frame_start:crc16_end]) != rd.read(16):
            raise ValueError("frame CRC-16 mismatch")
        for ci, ch in enumerate(chans):
            arr = np.asarray(ch, dtype=np.int64)
            if len(arr) and (arr.min() < -32768 or arr.max() > 32767):
                raise ValueError("decoded samples out of int16 range")
            decoded[ci].append(arr)
        got += n
        frame_no += 1
        if total == 0:
            break  # total-unknown streams: single frame only
    if total and got != total:
        raise ValueError(f"decoded {got} samples, STREAMINFO says {total}")

    chans_arr = [np.concatenate(c) if c else np.zeros(0, np.int64) for c in decoded]
    interleaved = np.stack(chans_arr, axis=1).reshape(-1).astype("<i2")
    if hashlib.md5(interleaved.tobytes()).digest() != want_md5:
        raise ValueError("STREAMINFO sample MD5 mismatch")
    if n_ch == 1:
        return chans_arr[0].astype("<i2"), rate
    return np.stack(chans_arr).astype("<i2"), rate
