"""WebDataset tar-shard spec tests (operators/tar_shards.py)."""

from __future__ import annotations

import io
import tarfile

import pytest

from console_datagen_spark.operators.tar_shards import pack_shard, unpack_shard

ROWS = [(7, "hello world", "en"), (3, "bonjour", "fr"), (12, "hola", "es")]


def test_roundtrip_identity_and_sorted():
    assert unpack_shard(pack_shard(ROWS)) == sorted(ROWS)


def test_deterministic_bytes():
    # content-addressability: same rows (any order) -> same bytes
    assert pack_shard(ROWS) == pack_shard(list(reversed(ROWS)))


def test_real_tar_layout():
    # the shard is a REAL tar any external reader consumes
    with tarfile.open(fileobj=io.BytesIO(pack_shard(ROWS)), mode="r:") as tf:
        names = tf.getnames()
    assert names == [
        "000000000003.txt", "000000000003.lang",
        "000000000007.txt", "000000000007.lang",
        "000000000012.txt", "000000000012.lang",
    ]


def test_unicode_payloads():
    rows = [(1, "héllo wörld 世界", "zh")]
    assert unpack_shard(pack_shard(rows)) == rows


def test_rejects_bad_shards():
    with pytest.raises(ValueError, match="empty shard"):
        pack_shard([])
    with pytest.raises(ValueError, match="not a tar shard"):
        unpack_shard(b"definitely not a tar file" * 40)
    # missing sidecar member
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo(name="000000000001.txt")
        info.size = 2
        tf.addfile(info, io.BytesIO(b"hi"))
    with pytest.raises(ValueError, match="missing members"):
        unpack_shard(buf.getvalue())
    # foreign member name
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo(name="README.md")
        info.size = 2
        tf.addfile(info, io.BytesIO(b"hi"))
    with pytest.raises(ValueError, match="unexpected member name"):
        unpack_shard(buf.getvalue())
    # out-of-order samples break sequential readers
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name in ("000000000002.txt", "000000000001.txt"):
            info = tarfile.TarInfo(name=name)
            info.size = 1
            tf.addfile(info, io.BytesIO(b"x"))
    with pytest.raises(ValueError, match="out of key order"):
        unpack_shard(buf.getvalue())


def test_media_shard_binary_roundtrip():
    """Binary members survive byte-verbatim (the multimodal payload
    claim the text path cannot make): arbitrary bytes incl. NUL, 0xFF,
    tar-block-boundary sizes."""
    from console_datagen_spark.operators.tar_shards import (
        pack_media_shard,
        unpack_media_shard,
    )

    rows = [
        (3, b"\x00\xff" * 300),
        (1, b"qoif" + bytes(range(256))),
        (9, b"x" * 512),  # exactly one tar data block
        (10, b""),
    ]
    assert unpack_media_shard(pack_media_shard(rows)) == sorted(rows)
    # deterministic bytes regardless of input order
    assert pack_media_shard(rows) == pack_media_shard(list(reversed(rows)))


def test_media_shard_rejects_bad_members():
    import io
    import tarfile

    import pytest

    from console_datagen_spark.operators.tar_shards import (
        pack_media_shard,
        unpack_media_shard,
    )

    with pytest.raises(ValueError, match="empty shard"):
        pack_media_shard([])

    def craft(names):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for name in names:
                info = tarfile.TarInfo(name=name)
                info.size = 1
                tf.addfile(info, io.BytesIO(b"x"))
        return buf.getvalue()

    with pytest.raises(ValueError, match="unexpected member name"):
        unpack_media_shard(craft(["000000000001.txt"]))  # wrong ext
    with pytest.raises(ValueError, match="out of key order"):
        unpack_media_shard(
            craft(["000000000002.qoi", "000000000001.qoi"])
        )
    with pytest.raises(ValueError, match="duplicated|out of key order"):
        unpack_media_shard(
            craft(["000000000002.qoi", "000000000002.qoi"])
        )
    with pytest.raises(ValueError, match="not a tar"):
        unpack_media_shard(b"definitely not a tar archive")
