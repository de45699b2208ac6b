"""Baseline JPEG codec (operators/jpeg.py) — the r11 verdict #3 close.

Three layers of certification:
1. Wire format: markers, self-described tables, byte stuffing, odd
   dimensions, declared-scope rejections (progressive, subsampling).
2. Lossy-codec behavior on GENERAL images: deterministic bytes,
   error bounds appropriate to Annex-K quantization (smooth content
   near-exact, noise bounded), RGB color path.
3. The certification surface: every EXACT_TILES x DC-offset pair
   round-trips bit-exactly (what makes mm_resize_jpeg hash-certifiable
   on a lossy codec), plus the Spark pipeline parity vs the registered
   DuckDB oracle at sf0.001.
"""

import numpy as np
import pytest

from console_datagen_spark.operators.jpeg import (
    AC_CHROMA,
    AC_LUMA,
    DC_CHROMA,
    DC_LUMA,
    EXACT_TILES,
    N_EXACT_TILES,
    N_TILE_OFFSETS,
    ZIGZAG,
    _canonical_codes,
    decode_jpeg,
    encode_jpeg,
    exact_tile_pixels,
)


def test_wire_format_markers_and_determinism():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8) + 60
    enc = encode_jpeg(img)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in enc[:30]
    assert b"\xff\xdb" in enc and b"\xff\xc4" in enc  # DQT + DHT carried
    assert b"\xff\xc0" in enc and b"\xff\xda" in enc  # SOF0 + SOS
    assert enc == encode_jpeg(img)  # bit-deterministic


def test_huffman_tables_are_valid_prefix_codes():
    """Each Annex K table must assign every symbol a unique code with
    the canonical prefix property (no code is a prefix of another) and
    never overflow its length class."""
    for bits, vals in (DC_LUMA, DC_CHROMA, AC_LUMA, AC_CHROMA):
        assert sum(bits) == len(vals) == len(set(vals))
        codes = _canonical_codes(bits, vals)
        seen = set()
        for sym, (code, ln) in codes.items():
            assert code < (1 << ln)  # fits its length
            # prefix-freedom: pad every code to 16 bits as a range
            lo = code << (16 - ln)
            hi = (code + 1) << (16 - ln)
            for plo, phi in seen:
                assert hi <= plo or lo >= phi, "prefix collision"
            seen.add((lo, hi))
    assert len(AC_LUMA[1]) == 162 and len(AC_CHROMA[1]) == 162


def test_zigzag_is_the_standard_diagonal_walk():
    # spot anchors of T.81 Figure A.6
    assert ZIGZAG[0, 0] == 0 and ZIGZAG[0, 1] == 1 and ZIGZAG[1, 0] == 2
    assert ZIGZAG[2, 0] == 3 and ZIGZAG[7, 7] == 63
    assert sorted(ZIGZAG.reshape(-1).tolist()) == list(range(64))


def test_gray_roundtrip_bounds_and_odd_dims():
    rng = np.random.default_rng(11)
    # smooth gradient: quantization error stays tiny
    y, x = np.mgrid[0:16, 0:16]
    smooth = (90 + 3 * x + 2 * y).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(smooth))
    assert out.shape == (16, 16, 3)
    assert np.all(out[..., 0] == out[..., 1]) and np.all(out[..., 1] == out[..., 2])
    assert np.abs(out[..., 0].astype(int) - smooth.astype(int)).max() <= 4

    # odd dims exercise partial-MCU padding + SOF crop
    noisy = rng.integers(0, 256, size=(13, 21), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(noisy))
    assert out.shape == (13, 21, 3)
    # noise is what Annex-K quantization destroys; the bound is loose
    # but real — a broken entropy coder produces garbage far past it
    assert np.abs(out[..., 0].astype(int) - noisy.astype(int)).mean() < 40


def test_rgb_color_roundtrip():
    rng = np.random.default_rng(3)
    blocks = rng.integers(40, 200, size=(2, 2, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)  # 16x16 smooth
    enc = encode_jpeg(img, gray=False)
    out = decode_jpeg(enc)
    assert out.shape == (16, 16, 3)
    # 4:4:4 chroma with Annex-K chroma table: flat regions within a few
    # quant steps of the original in every channel
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 24
    # a replicated-gray 3-channel input auto-encodes as 1 component
    g = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    gray3 = np.stack([g, g, g], axis=-1)
    assert len(encode_jpeg(gray3)) < len(encode_jpeg(gray3, gray=False))


def test_byte_stuffing_survives_roundtrip():
    """Find an image whose entropy stream contains a stuffed 0xFF00 and
    assert the decoder unstuffs it (the classic corruption point)."""
    rng = np.random.default_rng(0)
    for _ in range(200):
        img = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
        enc = encode_jpeg(img)
        body = enc[2:-2]
        if b"\xff\x00" in body:
            decode_jpeg(enc)  # must not raise
            return
    pytest.fail("no stuffed byte produced in 200 random images")


def test_scope_rejections_are_loud():
    img = np.zeros((8, 8), dtype=np.uint8)
    enc = bytearray(encode_jpeg(img))
    sof = enc.find(b"\xff\xc0")
    # rewrite SOF0 -> SOF2 (progressive): decoder must refuse, not garble
    enc[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(enc))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 2), dtype=np.uint8))


def test_exact_tiles_roundtrip_every_offset():
    """The certification invariant behind mm_resize_jpeg: every
    (tile, DC offset) the synthesis can emit round-trips bit-exactly,
    and the tile set has real AC structure (not just flat blocks)."""
    assert N_EXACT_TILES >= 4
    nonflat = 0
    for k, tile in enumerate(EXACT_TILES):
        if tile.std() > 0:
            nonflat += 1
        for off in range(N_TILE_OFFSETS):
            img = (tile.astype(np.int64) + 2 * off).astype(np.uint8)
            got = decode_jpeg(encode_jpeg(img))[:, :, 0]
            assert np.array_equal(got, img), f"tile {k} offset {off}"
    assert nonflat >= 3  # AC coefficients genuinely exercised


def test_exact_tile_pixels_matches_synthesis_formula():
    for doc_id in (0, 1, 5, 28, 29, 57, 116):
        px = exact_tile_pixels(doc_id)
        tile = EXACT_TILES[doc_id % N_EXACT_TILES]
        assert np.array_equal(
            px, (tile.astype(np.int64) + 2 * (doc_id % 29)).astype(np.uint8)
        )


def test_resize_images_out_fmt_and_query_parity(spark, sf_dir):
    """The Spark pipeline (synth jpeg -> decode -> resize -> PPM
    re-encode -> sums) against the registered DuckDB oracle — the same
    compare the driver runs, at sf0.001 for speed."""
    import duckdb

    from console_datagen_spark.plans import all_queries

    spec = all_queries()["mm_resize_jpeg"]
    got = {
        (r.doc_id, r.n_bytes, r.r_sum, r.g_sum, r.b_sum)
        for r in spec.spark(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = set(map(tuple, con.execute(spec.oracle).fetchall()))
    assert got == want and len(got) > 0


def test_resize_images_same_fmt_jpeg_roundtrip(spark, sf_dir):
    """resize_images without out_fmt re-encodes jpeg as jpeg: the
    output must be decodable and carry the resized dimensions (lossy,
    so only structure is asserted — exactness belongs to the PPM-out
    spelling)."""
    import console_datagen_spark.operators.multimodal as M

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").limit(8)
    )
    media = M.synth_bitmap_media(docs, 8, 8, fmt="jpeg")
    resized = M.resize_images(media, 4, 4)
    rows = resized.collect()
    assert len(rows) == 8
    for r in rows:
        assert r.fmt == "jpeg"
        arr = decode_jpeg(bytes(r.content))
        assert arr.shape == (4, 4, 3)
