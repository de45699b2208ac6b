"""QOI ("Quite OK Image") codec — the modern lossless raster format.

Implements the complete public QOI specification (qoiformat.org, 2022;
public domain, one page) with original numpy/stdlib code, completing
the raster codec family (PPM/BMP/PNG/JPEG/GIF): QOI is the format
modern asset pipelines use when they want PNG-class lossless
compression at memcpy-class speed, and its byte stream is a pure
function of the pixels — no entropy coder, no codec-version drift — so
an encode -> decode round trip is exactly certifiable in the hash gate.

Format (all ops implemented, encode and decode):
- 14-byte header: magic ``qoif``, width/height u32 BE, channels (3/4),
  colorspace.
- Sequential chunk stream against (a) the previous pixel, starting
  (0,0,0,255), and (b) a 64-slot running index addressed by the hash
  ``(3r + 5g + 7b + 11a) % 64``:
  ``QOI_OP_RUN`` (0b11, lengths 1..62 — 63/64 collide with the RGB/RGBA
  tags), ``QOI_OP_INDEX`` (0b00), ``QOI_OP_DIFF`` (0b01, per-channel
  -2..1 with mod-256 wraparound), ``QOI_OP_LUMA`` (0b10, dg -32..31
  with dr-dg / db-dg in -8..7), ``QOI_OP_RGB`` (0xFE), ``QOI_OP_RGBA``
  (0xFF); 8-byte end marker 0x00*7 + 0x01.
- Encoder op priority is pinned to the reference encoder's: run first,
  then index, then diff, then luma, then rgb/rgba — so the emitted
  bytes are deterministic and content-addressable.

The decoder rejects loudly: bad magic, zero dimensions, unknown
channels, a RUN of 63/64 cannot even be expressed, truncated streams,
missing/garbled end marker, and trailing bytes after it.

Scale shape: images are independent rows — encode/decode are
mapInPandas kernels over a binary column, embarrassingly parallel, no
shuffle (the certified query reduces per-doc stats afterwards).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"qoif"
_END = b"\x00" * 7 + b"\x01"


def _hash(px: tuple[int, int, int, int]) -> int:
    r, g, b, a = px
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(
    arr: np.ndarray, colorspace: int = 0
) -> bytes:
    """(H, W, 3|4) uint8 -> QOI bytes with the reference op priority."""
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError(f"expected HxWx3/4 array, got {arr.shape}")
    if arr.dtype != np.uint8:
        raise ValueError(f"expected uint8 pixels, got {arr.dtype}")
    h, w, ch = arr.shape
    if h == 0 or w == 0:
        raise ValueError("zero-dimension image")
    out = bytearray()
    out += _MAGIC
    out += struct.pack(">IIBB", w, h, ch, colorspace)
    index: list[tuple[int, int, int, int]] = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    flat = arr.reshape(-1, ch)
    for row in flat:
        if ch == 3:
            px = (int(row[0]), int(row[1]), int(row[2]), prev[3])
        else:
            px = (int(row[0]), int(row[1]), int(row[2]), int(row[3]))
        if px == prev:
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        hsh = _hash(px)
        if index[hsh] == px:
            out.append(hsh)
        else:
            index[hsh] = px
            if px[3] == prev[3]:
                dr = (px[0] - prev[0] + 128) % 256 - 128
                dg = (px[1] - prev[1] + 128) % 256 - 128
                db = (px[2] - prev[2] + 128) % 256 - 128
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
                elif (
                    -32 <= dg <= 31
                    and -8 <= dr - dg <= 7
                    and -8 <= db - dg <= 7
                ):
                    out.append(0x80 | (dg + 32))
                    out.append(((dr - dg + 8) << 4) | (db - dg + 8))
                else:
                    out += bytes((0xFE, px[0], px[1], px[2]))
            else:
                out += bytes((0xFF, px[0], px[1], px[2], px[3]))
        prev = px
    if run:
        out.append(0xC0 | (run - 1))
    out += _END
    return bytes(out)


def decode_qoi(content: bytes) -> tuple[np.ndarray, dict]:
    """QOI bytes -> ((H, W, channels) uint8, header metadata).

    Also returns the per-op usage histogram in the metadata (``ops``) so
    tests can assert an encoder actually exercised each chunk type."""
    if len(content) < 14 + len(_END):
        raise ValueError("truncated qoi stream (no room for header+end)")
    if content[:4] != _MAGIC:
        raise ValueError(f"bad magic {content[:4]!r}")
    w, h, ch, colorspace = struct.unpack(">IIBB", content[4:14])
    if w == 0 or h == 0:
        raise ValueError("zero-dimension image")
    if ch not in (3, 4):
        raise ValueError(f"unknown channel count {ch}")
    if colorspace not in (0, 1):
        raise ValueError(f"unknown colorspace {colorspace}")
    n = w * h
    px_out = np.empty((n, 4), dtype=np.uint8)
    index: list[tuple[int, int, int, int]] = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    pos = 14
    i = 0
    ops = {"run": 0, "index": 0, "diff": 0, "luma": 0, "rgb": 0, "rgba": 0}

    def need(k: int) -> None:
        if pos + k > len(content) - len(_END):
            raise ValueError(f"truncated qoi stream at chunk offset {pos}")

    while i < n:
        need(1)
        b0 = content[pos]
        pos += 1
        if b0 == 0xFE:
            need(3)
            prev = (content[pos], content[pos + 1], content[pos + 2], prev[3])
            pos += 3
            ops["rgb"] += 1
        elif b0 == 0xFF:
            need(4)
            prev = (
                content[pos],
                content[pos + 1],
                content[pos + 2],
                content[pos + 3],
            )
            pos += 4
            ops["rgba"] += 1
        elif b0 >> 6 == 0b00:
            prev = index[b0 & 0x3F]
            ops["index"] += 1
        elif b0 >> 6 == 0b01:
            dr = ((b0 >> 4) & 3) - 2
            dg = ((b0 >> 2) & 3) - 2
            db = (b0 & 3) - 2
            prev = (
                (prev[0] + dr) % 256,
                (prev[1] + dg) % 256,
                (prev[2] + db) % 256,
                prev[3],
            )
            ops["diff"] += 1
        elif b0 >> 6 == 0b10:
            need(1)
            dg = (b0 & 0x3F) - 32
            b1 = content[pos]
            pos += 1
            dr = dg + ((b1 >> 4) & 0x0F) - 8
            db = dg + (b1 & 0x0F) - 8
            prev = (
                (prev[0] + dr) % 256,
                (prev[1] + dg) % 256,
                (prev[2] + db) % 256,
                prev[3],
            )
            ops["luma"] += 1
        else:  # 0b11: run (0xFE/0xFF handled above, so length <= 62)
            run = (b0 & 0x3F) + 1
            if i + run > n:
                raise ValueError(
                    f"run of {run} overflows image at pixel {i}/{n}"
                )
            px_out[i : i + run] = prev
            i += run
            ops["run"] += 1
            continue
        index[_hash(prev)] = prev
        px_out[i] = prev
        i += 1
    if content[pos : pos + len(_END)] != _END:
        raise ValueError("missing or garbled end marker")
    if pos + len(_END) != len(content):
        raise ValueError(
            f"{len(content) - pos - len(_END)} trailing bytes after end marker"
        )
    meta = {"width": w, "height": h, "channels": ch, "colorspace": colorspace, "ops": ops}
    if ch == 3:
        return px_out.reshape(h, w, 4)[:, :, :3].copy(), meta
    return px_out.reshape(h, w, 4), meta
