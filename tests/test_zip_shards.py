"""Operator tests for ZIP shards (the random-access shard format)."""

from __future__ import annotations

import zipfile

import pytest

from console_datagen_spark.operators.zip_shards import (
    pack_zip_shard,
    read_member,
    unpack_zip_shard,
)

ROWS = [
    (7, "seven text", "en"),
    (3, "drei", "de"),
    (11, "once upon", "en"),
]


def test_roundtrip_identity_and_sorted():
    content = pack_zip_shard(ROWS)
    assert unpack_zip_shard(content) == sorted(ROWS)


def test_bytes_deterministic_and_order_free():
    a = pack_zip_shard(ROWS)
    b = pack_zip_shard(list(reversed(ROWS)))
    assert a == b
    # and re-packing the unpacked rows is a fixed point
    assert pack_zip_shard(unpack_zip_shard(a)) == a


def test_random_access_member_reads():
    content = pack_zip_shard(ROWS)
    assert read_member(content, 3, "txt") == "drei"
    assert read_member(content, 11, "lang") == "en"
    with pytest.raises(ValueError, match="no member"):
        read_member(content, 99, "txt")
    with pytest.raises(ValueError, match="unknown extension"):
        read_member(content, 3, "exe")


def test_rejects_non_zip_and_empty():
    with pytest.raises(ValueError, match="not a zip"):
        unpack_zip_shard(b"PK\x00\x00garbage")
    with pytest.raises(ValueError, match="empty shard"):
        pack_zip_shard([])


def test_rejects_bad_names_missing_members_and_compression():
    import io

    def craft(members, compress=zipfile.ZIP_STORED):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", compression=compress) as zf:
            for name, payload in members:
                info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
                info.compress_type = compress
                zf.writestr(info, payload)
        return buf.getvalue()

    with pytest.raises(ValueError, match="unexpected member name"):
        unpack_zip_shard(craft([("README.md", b"x")]))
    with pytest.raises(ValueError, match="missing members"):
        unpack_zip_shard(craft([("000000000005.txt", b"x")]))
    with pytest.raises(ValueError, match="out of key order"):
        unpack_zip_shard(
            craft(
                [
                    ("000000000009.txt", b"x"),
                    ("000000000009.lang", b"en"),
                    ("000000000005.txt", b"y"),
                    ("000000000005.lang", b"en"),
                ]
            )
        )
    with pytest.raises(ValueError, match="compressed"):
        unpack_zip_shard(
            craft(
                [
                    ("000000000005.txt", b"x" * 100),
                    ("000000000005.lang", b"en"),
                ],
                compress=zipfile.ZIP_DEFLATED,
            )
        )


def test_unicode_payloads_survive():
    rows = [(1, "naïve – résumé ✓", "fr"), (2, "日本語テキスト", "ja")]
    assert unpack_zip_shard(pack_zip_shard(rows)) == rows
