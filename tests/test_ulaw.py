"""Independent-math pins for the G.711 mu-law SQL codec."""

from __future__ import annotations

import hashlib

import numpy as np

from console_datagen_spark.plans import get_query
from console_datagen_spark.plans.extras import _ADPCM_N


def _samples(doc_id: int, n: int = _ADPCM_N) -> list[int]:
    """The md5-chain 16-bit sample stream shared by the ADPCM family."""
    n_md5 = (2 * n + 15) // 16
    hx = "".join(
        hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest() for i in range(n_md5)
    )[: 4 * n]
    out = []
    for i in range(n):
        u = int(hx[4 * i : 4 * i + 2], 16) + 256 * int(
            hx[4 * i + 2 : 4 * i + 4], 16
        )
        out.append(u - 65536 if u >= 32768 else u)
    return out


def _ulaw(x: int) -> tuple[int, int]:
    """Reference G.711 encode + segment-midpoint decode."""
    sgn = 1 if x < 0 else 0
    mb = min(abs(x), 32635) + 132
    e = mb.bit_length() - 8
    mant = (mb >> (e + 3)) & 15
    code = 255 - (sgn * 128 + e * 16 + mant)
    xhat = (1 - 2 * sgn) * ((2 * mant + 33) * (1 << (e + 2)) - 132)
    return code, xhat


def test_ulaw_oracle_matches_python_reference(duck):
    """Every per-doc row of the DuckDB oracle equals an independent
    Python implementation of G.711 over the same sample stream."""
    rows = duck.execute(get_query("mm_audio_ulaw").oracle).fetchall()
    assert rows
    for doc_id, n_samples, sumsq_dec, sse, max_abs_err, n_codes in rows[:25]:
        xs = np.array(_samples(doc_id), dtype=np.int64)
        codes, xh = zip(*[_ulaw(int(x)) for x in xs])
        xh = np.array(xh, dtype=np.int64)
        assert n_samples == len(xs)
        assert sumsq_dec == int((xh * xh).sum())
        assert sse == int(((xh - xs) ** 2).sum())
        assert max_abs_err == int(np.abs(xh - xs).max())
        assert n_codes == len(set(codes))


def test_ulaw_codec_properties():
    """Spec properties over the full 16-bit domain (sampled densely):
    8-bit codes, decode stays in range, the error is bounded by half the
    segment step (plus clip at the top), and the code is monotone
    nonincreasing in the signed sample (one's-complemented byte)."""
    xs = list(range(-33000, 33001, 7)) + [0, 1, -1, 32635, -32635, 32767, -32768]
    prev_code = None
    prev_x = None
    for x in sorted(set(xs)):
        code, xhat = _ulaw(x)
        assert 0 <= code <= 255
        assert -32124 <= xhat <= 32124
        clipped = max(-32635, min(32635, x))
        mb = abs(clipped) + 132
        e = mb.bit_length() - 8
        assert abs(xhat - clipped) <= 1 << (e + 2), (x, xhat)
        if prev_code is not None and prev_x < 0 <= x:
            prev_code = None  # sign flip: code space restarts
        if prev_code is not None:
            assert code <= prev_code or (x < 0 and code >= prev_code)
        prev_code, prev_x = code, x


def test_ulaw_code_space_is_byte_reversible():
    """Decoding the packed byte fields recovers exactly the encoder's
    (sign, exponent, mantissa) for all 256 codes — the format is a
    bijection on its field triple."""
    for sgn in (0, 1):
        for e in range(8):
            for mant in range(16):
                code = 255 - (sgn * 128 + e * 16 + mant)
                u = 255 - code
                assert (u >> 7, (u >> 4) & 7, u & 15) == (sgn, e, mant)
