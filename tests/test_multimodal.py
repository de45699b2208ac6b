"""Multimodal operator plumbing: schemas, batch shapes, determinism."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from console_datagen_spark.catalog import register_views
from console_datagen_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = register_views(spark, sf_dir, ("documents",))["documents"].limit(50)
    return M.synth_media(docs, "image", n_bytes=256).cache()


def test_media_schema_and_bytes(media):
    s = {f.name: f.dataType.simpleString() for f in media.schema.fields}
    assert s == {
        "doc_id": "bigint",
        "media_type": "string",
        "fmt": "string",
        "n_bytes": "int",
        "content": "binary",
    }
    row = media.first()
    assert len(bytes(row.content)) == 256
    assert row.fmt in ("png", "jpeg")
    # bytes must match the pure-Python twin (cross-layer determinism)
    assert bytes(row.content) == M._md5_chain_bytes(row.doc_id, 256)


def test_extract_features_shape_and_values(media):
    feats = M.extract_features(media)
    s = {f.name: f.dataType.simpleString() for f in feats.schema.fields}
    assert s["feature"] == "array<double>"
    rows = feats.orderBy("doc_id").collect()
    assert len(rows) == 50
    for r in rows[:5]:
        assert len(r.feature) == M.FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r.feature)
    # deterministic vs the reference implementation
    r0 = rows[0]
    expected = M._fake_decode_reference(M._md5_chain_bytes(r0.doc_id, 256))
    assert np.allclose(r0.feature, expected)


def test_features_partition_invariance(media):
    a = M.extract_features(media).orderBy("doc_id").collect()
    b = M.extract_features(media.repartition(7)).orderBy("doc_id").collect()
    assert [r.feature for r in a] == [r.feature for r in b]


def test_empty_payload_raises(spark):
    bad = spark.createDataFrame(
        [(1, "image", "png", 0, bytearray(b""))],
        M.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="empty media payload"):
        M.extract_features(bad).collect()


def test_frame_sampling(media):
    frames = M.sample_frames(media, frame_bytes=32, stride=2)
    per_doc = frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    # 256 bytes / 32 = 8 frames, stride 2 → 4 sampled frames per doc
    assert all(r.n == 4 for r in per_doc)
    f0 = frames.orderBy("doc_id", "frame_idx").first()
    assert f0.frame_idx == 0
    assert len(bytes(f0.frame)) == 32
    # sampled frame 0 is the first 32 bytes of the content
    assert bytes(f0.frame) == M._md5_chain_bytes(f0.doc_id, 256)[:32]


def test_resize_garbage_payloads_fail_loudly(media):
    # every raster format now has a native codec (r12 closed jpeg), so
    # synth_media's RANDOM bytes labeled 'png'/'jpeg' fail the REAL
    # signature checks — genuine decode errors, not a codec-library gate
    with pytest.raises(Exception, match="JPEG"):
        M.resize_images(media.where("fmt = 'jpeg'"), 64, 64).collect()
    with pytest.raises(Exception, match="PNG"):
        M.resize_images(media.where("fmt = 'png'"), 64, 64).collect()


def test_codec_roundtrips():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (8, 8, 3), dtype=np.uint8)
    assert np.array_equal(M._decode_ppm(M._encode_ppm(img)), img)
    assert np.array_equal(M._decode_bmp(M._encode_bmp(img)), img)
    # odd width exercises BMP's 4-byte row padding
    odd = rng.randint(0, 256, (5, 7, 3), dtype=np.uint8)
    assert np.array_equal(M._decode_bmp(M._encode_bmp(odd)), odd)
    # raster whose first byte is whitespace must not confuse the
    # header parse (the bytes.split hazard)
    ws = np.full((2, 2, 3), 32, dtype=np.uint8)
    assert np.array_equal(M._decode_ppm(M._encode_ppm(ws)), ws)
    # PNG: filter-0 and cycling-filter encodes both round-trip (the
    # cycle path runs Sub/Up/Average/Paeth reconstruction); gradients
    # stress the predictors harder than uniform noise
    grad = (np.arange(8 * 8 * 3, dtype=np.int64) % 256).astype(np.uint8)
    grad = grad.reshape(8, 8, 3)
    for arr in (img, odd, ws, grad):
        for mode in ("none", "cycle"):
            enc = M._encode_png(arr, row_filters=mode)
            assert enc[:8] == M._PNG_SIG
            assert np.array_equal(M._decode_png(enc), arr), mode


def test_png_decode_rejects_unsupported():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    good = M._encode_png(img)
    with pytest.raises(ValueError, match="not a PNG"):
        M._decode_png(b"JFIF" + good)
    # corrupt the IHDR color type (offset 8+4+4+9 = byte 25) -> RGBA
    bad_color = bytearray(good)
    bad_color[25] = 6
    with pytest.raises(ValueError, match="unsupported PNG"):
        M._decode_png(bytes(bad_color))
    # truncated IDAT must fail loudly (zlib or size check), not return
    # a short raster
    with pytest.raises(Exception):
        M._decode_png(good[:-20])


def test_resize_nearest_exact_map():
    img = np.arange(8 * 8 * 3, dtype=np.int64).reshape(8, 8, 3) % 256
    img = img.astype(np.uint8)
    assert np.array_equal(M._resize_nearest(img, 4, 4), img[::2, ::2])
    # upscale repeats: src = (dst * 8) // 16
    up = M._resize_nearest(img, 16, 16)
    assert up.shape == (16, 16, 3)
    assert np.array_equal(up[::2, ::2], img)


def test_resize_images_end_to_end(spark, sf_dir):
    docs = register_views(spark, sf_dir, ("documents",))["documents"].limit(20)
    for fmt in ("ppm", "bmp", "png"):
        media_df = M.synth_bitmap_media(docs, width=8, height=8, fmt=fmt)
        rows = M.resize_images(media_df, 4, 4).orderBy("doc_id").collect()
        assert len(rows) == 20
        for r in rows:
            src = np.frombuffer(
                M._md5_chain_bytes(r.doc_id, 8 * 8 * 3), dtype=np.uint8
            ).reshape(8, 8, 3)
            decode = M._CODECS[fmt][0]
            assert np.array_equal(decode(bytes(r.content)), src[::2, ::2]), (
                fmt,
                r.doc_id,
            )


def test_resize_bmp_ppm_pixel_parity(spark, sf_dir):
    """Same source pixels through either container format => identical
    resized pixels AND identical channel_sums output."""
    docs = register_views(spark, sf_dir, ("documents",))["documents"].limit(20)
    out = {}
    for fmt in ("ppm", "bmp", "png"):
        media_df = M.synth_bitmap_media(docs, width=8, height=8, fmt=fmt)
        sums = M.channel_sums(M.resize_images(media_df, 4, 4))
        out[fmt] = {
            r.doc_id: (r.r_sum, r.g_sum, r.b_sum) for r in sums.collect()
        }
    assert out["ppm"] == out["bmp"] == out["png"]
    # png_stats (the single-pass IHDR + sums kernel the registered
    # query uses) agrees with channel_sums and reports the resize dims
    media_df = M.synth_bitmap_media(docs, width=8, height=8, fmt="png")
    stats = M.png_stats(M.resize_images(media_df, 4, 4)).collect()
    assert {(r.ihdr_w, r.ihdr_h) for r in stats} == {(4, 4)}
    assert {
        r.doc_id: (r.r_sum, r.g_sum, r.b_sum) for r in stats
    } == out["png"]


def test_media_fingerprint_dedup_key(media):
    fps = M.media_fingerprint(media)
    assert fps.select("content_sha256").distinct().count() == 50


def test_map_in_arrow_token_stats_parity(spark, sf_dir):
    from console_datagen_spark.catalog import register_views
    from console_datagen_spark.operators.grouped import arrow_token_stats

    docs = register_views(spark, sf_dir, ("documents",))["documents"]
    got = {
        r.doc_id: r.n_tokens for r in arrow_token_stats(docs).collect()
    }
    want = {
        r.doc_id: r.n
        for r in docs.selectExpr(
            "doc_id", "CAST(size(split(text, ' ')) AS LONG) AS n"
        ).collect()
    }
    assert got == want


def test_audio_energy_windows(media):
    wins = M.audio_energy_windows(media, window_bytes=64, hop_bytes=32)
    rows = wins.orderBy("doc_id", "win_idx").collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    # 256 bytes, 64-byte window, 32-byte hop → 7 complete windows
    # (w*32 + 64 <= 256 → w <= 6); the incomplete tail is dropped
    assert all(len(v) == 7 for v in per_doc.values())
    doc_id, wrows = next(iter(per_doc.items()))
    raw = np.frombuffer(M._md5_chain_bytes(doc_id, 256), dtype=np.uint8)
    for r in wrows:
        s = int(raw[r.win_idx * 32 : r.win_idx * 32 + 64].sum())
        assert r.energy_permille == s * 1000 // (255 * 64)
        assert r.low_energy == (1 if r.energy_permille < 480 else 0)


def test_audio_windows_partition_invariance(media):
    a = M.audio_energy_windows(media).orderBy("doc_id", "win_idx").collect()
    b = (
        M.audio_energy_windows(media.repartition(7))
        .orderBy("doc_id", "win_idx")
        .collect()
    )
    assert a == b
