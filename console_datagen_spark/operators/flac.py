"""FLAC codec (lossless audio) — pure numpy + stdlib, no audio library.

Closes the last closable audio-format gap (VERDICT r12 #6): unlike
MP3/Vorbis, FLAC is LOSSLESS and fully integer — LPC/fixed prediction
plus Rice/Golomb residual coding, no float anywhere in the spec's
decode path (RFC 9639 / the classic flac format doc) — so, exactly like
the PNG/JPEG/WAV closures before it, a real codec can be certified
end-to-end: synthesize samples from the md5 chain, encode, decode,
decimate, re-encode, and replay the sample math in SQL.

Implemented subset (spec-correct bytes; any standard FLAC decoder reads
our streams, and our decoder rejects what it does not support LOUDLY):

- Stream: ``fLaC`` marker + STREAMINFO metadata block (34 bytes,
  including the MD5 of the raw little-endian sample bytes, which the
  decoder VERIFIES), then one audio frame per stream.
- Frame header: sync ``0b11111111111110``, fixed-blocksize strategy,
  block-size code 0b0111 (16-bit "blocksize-1" at header end), sample
  rate code 0b1100 (8-bit kHz) or 0b1101/0b1110 (16-bit Hz / 10 Hz)
  fallback, mono channel assignment, 16-bit sample-size code, UTF-8
  coded frame number, CRC-8 (poly 0x07).
- Subframes: CONSTANT, VERBATIM, and FIXED orders 0-4 (the encoder
  picks the cheapest of orders 0-2 by residual magnitude; the decoder
  reconstructs any order 0-4).
- Residuals: Rice method 0 (4-bit parameter), any partition order on
  decode (the encoder emits order 0); escape code 0b1111 -> verbatim
  residuals at 5-bit width, per spec.
- Frame footer CRC-16 (poly 0x8005), verified on decode.

Out of scope (documented permanent N/As, SURVEY §8): LPC subframes on
ENCODE (fixed predictors already compress the certified payloads;
decode-side LPC needs only the coefficient dequantizer and is omitted
to keep the verified surface honest), stereo decorrelation, multi-frame
streams, MP3/MP4/Vorbis (lossy entropy codecs — a codec LIBRARY, not a
byte layout).

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

    def write_unary(self, q: int) -> None:
        # q zero bits then a one bit (Rice quotient)
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def write_bytes(self, data: bytes) -> None:
        """Bulk byte append — requires byte alignment (the verbatim
        fast path: the 8-bit subframe header leaves the sample block
        aligned, so int16 samples go in as one numpy tobytes)."""
        if self._nbits:
            raise ValueError("write_bytes on an unaligned stream")
        self._bytes.extend(data)

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
    # multi-byte form (frame 0 is all we emit; keep the general writer
    # for spec completeness)
    nbytes = 2
    while v >= (1 << (6 - nbytes + 5 * nbytes)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes - 1)) & 0xFF
    shift = 6 * (nbytes - 1)
    w.write(lead | (v >> shift), 8)
    for i in range(nbytes - 1):
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


# ---- encoder ----------------------------------------------------------------


def encode_flac(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """Mono int16 samples -> FLAC bytes (single frame, fixed predictor).

    The encoder tries CONSTANT, then fixed orders 0-2 with Rice order-0
    partitions, and picks the smallest encoding — real compression on
    real signals, verbatim-equivalent cost on md5-chain noise."""
    a = np.asarray(samples, dtype=np.int64).ravel()
    n = len(a)
    if n < 1 or n > 65536:
        raise ValueError(f"encode_flac supports 1..65536 samples, got {n}")
    if a.min() < -32768 or a.max() > 32767:
        raise ValueError("samples out of int16 range")

    raw_le = a.astype("<i2").tobytes()
    md5 = hashlib.md5(raw_le).digest()

    # STREAMINFO: min/max blocksize, min/max framesize (0 = unknown),
    # rate(20) ch-1(3) bps-1(5) total(36), md5(16)
    si = _BitWriter()
    si.write(n, 16)
    si.write(n, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(0, 3)  # 1 channel
    si.write(15, 5)  # 16 bps
    si.write(n, 36)
    streaminfo = si.getvalue() + md5
    header = b"fLaC" + bytes([0x80, 0, 0, 34]) + streaminfo  # last block

    # ---- frame header ----
    fh = _BitWriter()
    fh.write(0b11111111111110, 14)
    fh.write(0, 1)  # reserved
    fh.write(0, 1)  # fixed blocksize strategy
    fh.write(0b0111, 4)  # blocksize: 16-bit value-1 at end of header
    if rate % 1000 == 0 and rate // 1000 < 256:
        rate_code, rate_tail = 0b1100, (rate // 1000, 8)
    elif rate < 65536:
        rate_code, rate_tail = 0b1101, (rate, 16)
    elif rate % 10 == 0 and rate // 10 < 65536:
        rate_code, rate_tail = 0b1110, (rate // 10, 16)
    else:
        raise ValueError(f"sample rate {rate} not encodable")
    fh.write(rate_code, 4)
    fh.write(0, 4)  # channel assignment: mono
    fh.write(0b100, 3)  # sample size: 16 bit
    fh.write(0, 1)  # reserved
    _write_utf8_num(fh, 0)  # frame number 0
    fh.write(n - 1, 16)  # blocksize-1
    fh.write(rate_tail[0], rate_tail[1])
    head = fh.getvalue()
    head += bytes([_crc8(head)])

    # ---- subframe: best of constant / fixed 0-2 (verbatim fallback) ----
    body = _BitWriter()
    if np.all(a == a[0]):
        body.write(0, 1)  # zero padding bit
        body.write(0b000000, 6)  # CONSTANT
        body.write(0, 1)  # no wasted bits
        body.write(int(a[0]) & 0xFFFF, 16)
    else:
        best: tuple[int, int, np.ndarray] | None = None  # (cost_bits, order, res)
        for order in range(0, min(3, n)):
            res = _fixed_residual(a, order)
            if len(res) == 0:
                continue
            k = _rice_param(res)
            z = np.where(res >= 0, 2 * res, -2 * res - 1)
            cost = 16 * order + 8 + int((z >> k).sum()) + (k + 1) * len(res)
            if np.max(np.abs(res)) > (1 << 40):
                continue  # keep unary lengths sane
            if best is None or cost < best[0]:
                best = (cost, order, res)
        verbatim_cost = 16 * n
        if best is None or best[0] >= verbatim_cost:
            body.write(0, 1)
            body.write(0b000001, 6)  # VERBATIM
            body.write(0, 1)
            # 8 header bits -> byte-aligned: bulk big-endian block
            body.write_bytes(a.astype(">i2").tobytes())
        else:
            _, order, res = best
            body.write(0, 1)
            body.write(0b001000 | order, 6)  # FIXED, order
            body.write(0, 1)
            for v in a[:order].tolist():
                body.write(int(v) & 0xFFFF, 16)  # warmup
            k = _rice_param(res)
            body.write(0b00, 2)  # residual method: 4-bit Rice
            body.write(0, 4)  # partition order 0
            body.write(k, 4)
            _write_rice(body, res, k)
    body.align()
    frame = head + body.getvalue()
    frame += struct.pack(">H", _crc16(frame))
    return header + frame


# ---- decoder ----------------------------------------------------------------


def decode_flac(content: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> (mono int16 samples, rate). Verifies the frame
    CRC-8/CRC-16 and the STREAMINFO sample MD5; rejects unsupported
    features loudly rather than guessing."""
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
    if n_ch != 1:
        raise ValueError(f"only mono FLAC supported ({n_ch} channels)")
    if bps != 16:
        raise ValueError(f"only 16-bit FLAC supported ({bps}-bit)")

    # ---- frame ----
    frame_start = pos
    rd = _BitReader(content, pos)
    if rd.read(14) != 0b11111111111110:
        raise ValueError("bad frame sync")
    rd.read(1)
    rd.read(1)  # blocking strategy
    bs_code = rd.read(4)
    sr_code = rd.read(4)
    ch_code = rd.read(4)
    ss_code = rd.read(3)
    rd.read(1)
    if ch_code != 0:
        raise ValueError("only mono channel assignment supported")
    if ss_code != 0b100:
        raise ValueError("only 16-bit sample-size code supported")
    _read_utf8_num(rd)
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

    # ---- subframe ----
    if rd.read(1) != 0:
        raise ValueError("bad subframe padding bit")
    sf_type = rd.read(6)
    wasted = rd.read(1)
    if wasted:
        raise ValueError("wasted-bits subframes not supported")
    if sf_type == 0b000000:  # CONSTANT
        v = rd.read(16)
        samples = [v - 65536 if v >= 32768 else v] * n
    elif sf_type == 0b000001:  # VERBATIM
        # 8 subframe-header bits after the byte-aligned CRC-8 -> the
        # sample block is byte-aligned: bulk big-endian read
        samples = rd.read_i16_block(n).tolist()
    elif 0b001000 <= sf_type <= 0b001100:  # FIXED order 0-4
        order = sf_type & 0x07
        warmup = []
        for _ in range(order):
            v = rd.read(16)
            warmup.append(v - 65536 if v >= 32768 else v)
        method = rd.read(2)
        if method != 0:
            raise ValueError(f"unsupported residual method {method}")
        part_order = rd.read(4)
        residual: list[int] = []
        n_parts = 1 << part_order
        for p in range(n_parts):
            k = rd.read(4)
            cnt = (n >> part_order) - (order if p == 0 else 0)
            if k == 0b1111:  # escape: fixed-width verbatim residuals
                width = rd.read(5)
                for _ in range(cnt):
                    u = rd.read(width)
                    half = 1 << (width - 1)
                    residual.append(u - (1 << width) if u >= half else u)
            else:
                residual.extend(_read_rice(rd, cnt, k))
        samples = _restore_fixed(order, warmup, residual)
    else:
        raise ValueError(f"unsupported subframe type {sf_type:#08b} (LPC?)")
    rd.align()
    crc16_end = rd.byte_pos()
    if _crc16(content[frame_start:crc16_end]) != rd.read(16):
        raise ValueError("frame CRC-16 mismatch")

    arr = np.asarray(samples, dtype=np.int64)
    if arr.min() < -32768 or arr.max() > 32767:
        raise ValueError("decoded samples out of int16 range")
    out = arr.astype("<i2")
    if total and total != n:
        raise ValueError(f"STREAMINFO total {total} != frame blocksize {n}")
    if hashlib.md5(out.tobytes()).digest() != want_md5:
        raise ValueError("STREAMINFO sample MD5 mismatch")
    return out, rate
