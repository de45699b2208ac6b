"""Delta-of-delta + zigzag + varint timestamp compression (Gorilla-style).

The standard time-series block codec (Pelkonen et al. 2015 "Gorilla",
VLDB; the same scheme Prometheus' TSDB uses for timestamps): regular
cadences make second differences tiny, so storing
``zigzag(delta-of-delta)`` as LEB128 varints compresses a sorted
timestamp column ~10x with no entropy coder — every byte is a pure
integer function of the inputs, so both the decoded stream AND the
exact compressed size are SQL-replayable (varint length is just
bit-length arithmetic), which is what puts a real columnar codec inside
the hash gate.

Stream spec, shared bit-for-bit with the SQL oracle:
- value sequence per series: v_1 = first timestamp (epoch us),
  v_2 = t_2 - t_1, v_i = (t_i - t_{i-1}) - (t_{i-1} - t_{i-2}) for
  i >= 3 — one uniform rule, no header.
- each v is zigzag-mapped (z = 2v if v >= 0 else -2v - 1) then LEB128:
  7 data bits per byte, 0x80 continuation, little-endian groups,
  minimal length (no redundant trailing 0x00 groups).

The decoder rejects loudly: truncated varints, varints longer than 10
bytes (> 2^70 cannot be a BIGINT value), non-minimal encodings, and
empty streams.

Scale shape: series are independent groups, but they are MANY and
SMALL (the worst case for per-group ``applyInPandas``, which pays one
Arrow invocation per key — measured 10+ s for 1.5k keys at sf0.1), so
the certified query uses the sorted-partition streaming walk instead:
repartition by key, ``sortWithinPartitions(key, ts)``, then ONE
``mapInPandas`` call per partition iterates key boundaries with a
carry for keys Arrow splits across batches — 8x faster at sf0.1 and
the shape that holds at 100 TB where series count grows with data.
"""

from __future__ import annotations


def _zigzag(v: int) -> int:
    return 2 * v if v >= 0 else -2 * v - 1


def _unzigzag(z: int) -> int:
    return z // 2 if z % 2 == 0 else -(z + 1) // 2


def varint_len(z: int) -> int:
    """LEB128 byte length of a zigzagged value — the quantity the SQL
    oracle computes as GREATEST(1, (bitlen(z) + 6) DIV 7)."""
    if z < 0:
        raise ValueError("varint domain is non-negative (zigzag first)")
    return max(1, (z.bit_length() + 6) // 7)


def encode_ts_stream(epochs: list[int]) -> bytes:
    """Sorted epoch-us timestamps -> delta-of-delta varint bytes."""
    if not epochs:
        raise ValueError("empty series")
    out = bytearray()
    prev = prev_delta = None
    for i, t in enumerate(epochs):
        if i == 0:
            v = t
        elif i == 1:
            v = t - prev
            prev_delta = v
        else:
            d = t - prev
            v = d - prev_delta
            prev_delta = d
        prev = t
        z = _zigzag(v)
        while True:
            b = z & 0x7F
            z >>= 7
            if z:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    return bytes(out)


def decode_ts_stream(content: bytes) -> list[int]:
    """Varint bytes -> epoch-us timestamps, validating the encoding."""
    if not content:
        raise ValueError("empty series")
    vals = []
    pos = 0
    n = len(content)
    while pos < n:
        z = 0
        shift = 0
        start = pos
        while True:
            if pos >= n:
                raise ValueError(f"truncated varint at byte {start}")
            b = content[pos]
            pos += 1
            z |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                if b == 0 and shift > 7:
                    raise ValueError(
                        f"non-minimal varint at byte {start} "
                        "(redundant zero continuation group)"
                    )
                break
            if shift >= 70:
                raise ValueError(f"varint longer than 10 bytes at {start}")
        vals.append(_unzigzag(z))
    out = []
    prev = prev_delta = None
    for i, v in enumerate(vals):
        if i == 0:
            t = v
        elif i == 1:
            t = prev + v
            prev_delta = v
        else:
            d = prev_delta + v
            t = prev + d
            prev_delta = d
        out.append(t)
        prev = t
    return out
