"""RIFF/PCM WAV codec (operators/wav.py): the audio twin of the image
codec tier — real bytes, lossless round-trip, loud scope rejections,
and the certified Spark pipeline vs the registered DuckDB oracle."""

import struct

import numpy as np
import pytest

from console_datagen_spark.operators.wav import (
    decimate,
    decode_wav,
    encode_wav,
    energy_windows_sumsq,
)


def test_mono_roundtrip_exact():
    rng = np.random.default_rng(5)
    s = rng.integers(-32768, 32768, size=257, dtype=np.int16)
    enc = encode_wav(s, rate=8_000)
    assert enc[:4] == b"RIFF" and enc[8:12] == b"WAVE"
    assert len(enc) == 44 + 2 * 257  # canonical header + PCM data
    out, rate = decode_wav(enc)
    assert rate == 8_000 and np.array_equal(out, s)
    assert enc == encode_wav(s, rate=8_000)  # deterministic


def test_stereo_roundtrip_and_interleave():
    rng = np.random.default_rng(6)
    s = rng.integers(-32768, 32768, size=(64, 2), dtype=np.int16)
    out, rate = decode_wav(encode_wav(s, rate=44_100))
    assert rate == 44_100 and out.shape == (64, 2)
    assert np.array_equal(out, s)


def test_extra_chunks_skipped_and_word_alignment():
    """RIFF chunks other than fmt/data (LIST, odd-length) must be walked
    over, including the pad byte after odd-length chunks."""
    s = np.arange(10, dtype=np.int16)
    enc = bytearray(encode_wav(s))
    # splice an odd-length junk chunk between WAVE and fmt
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad to even
    spliced = bytes(enc[:12]) + junk + bytes(enc[12:])
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    out, _ = decode_wav(spliced)
    assert np.array_equal(out, s)


def test_scope_rejections():
    s = np.zeros(4, dtype=np.int16)
    enc = bytearray(encode_wav(s))
    fmt_at = bytes(enc).find(b"fmt ") + 8
    enc[fmt_at] = 3  # format tag 3 = IEEE float
    with pytest.raises(ValueError, match="PCM"):
        decode_wav(bytes(enc))
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio at all")
    with pytest.raises(ValueError):
        encode_wav(np.zeros((4, 3), dtype=np.int16))  # 3 channels


def test_decimate_and_energy_integer_exact():
    s = np.array([0, 100, -200, 300, -32768, 500, 600, 700], dtype=np.int16)
    assert np.array_equal(decimate(s, 2), s[::2])
    wins = energy_windows_sumsq(s, window=4, hop=4)
    # window 0: (0,100,-200,300) -> sumsq 140000 * 1000 // (4 * 2^30)
    assert wins[0] == (0, 140000 * 1000 // (4 * 32768 * 32768))
    # full-scale -32768 cannot exceed 1000 permille
    full = np.full(4, -32768, dtype=np.int16)
    assert energy_windows_sumsq(full, window=4, hop=4)[0][1] == 1000


def test_mm_audio_wav_query_parity(spark, sf_dir):
    """The registered pipeline vs its DuckDB oracle at sf0.001 — the
    driver's own compare shape."""
    import duckdb

    from console_datagen_spark.plans import all_queries

    spec = all_queries()["mm_audio_wav"]
    got = {tuple(r) for r in spec.spark(spark, sf_dir).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = set(map(tuple, con.execute(spec.oracle).fetchall()))
    assert got == want and len(got) > 0
