"""WebDataset-style tar shards — the LLM training-data storage format.

Large multimodal training runs read *sharded tar archives* (WebDataset/
NVIDIA Megatron-Energon convention): each shard is a plain POSIX tar of
member files named ``{key}.{ext}``, consumed sequentially so object
stores serve them at full bandwidth with no per-sample round trips. This
module implements the format with the stdlib ``tarfile`` only:

- ``pack_shard(rows)``: documents -> deterministic uncompressed tar bytes
  (fixed mtime/uid/gid/mode so identical content yields identical bytes —
  the property that makes shards content-addressable and dedupable).
- ``unpack_shard(content)``: tar bytes -> rows, validating the WebDataset
  naming convention (all extensions of one sample adjacent, keys sorted).

Scale shape: one shard = one task. ``applyInPandas`` over
``doc_id // docs_per_shard`` groups builds shards in parallel with no
driver involvement; the certified query (io_tar_shards_roundtrip)
re-opens every shard and proves pack->unpack is the identity by
re-deriving the corpus checksum from the unpacked rows.
"""

from __future__ import annotations

import io
import tarfile


def pack_shard(rows: list[tuple[int, str, str]]) -> bytes:
    """[(doc_id, text, lang)] -> deterministic uncompressed tar bytes.

    Each sample contributes ``{doc_id:012d}.txt`` (the payload) and
    ``{doc_id:012d}.lang`` (a sidecar metadata member) — the WebDataset
    convention of one basename per sample with one member per modality.
    Members are emitted in sorted key order with pinned metadata so the
    bytes are a pure function of the content."""
    if not rows:
        raise ValueError("empty shard")
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for doc_id, text, lang in sorted(rows):
            for ext, payload in (("txt", text), ("lang", lang)):
                data = payload.encode("utf-8")
                info = tarfile.TarInfo(name=f"{doc_id:012d}.{ext}")
                info.size = len(data)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                info.mode = 0o644
                tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def unpack_shard(content: bytes) -> list[tuple[int, str, str]]:
    """Tar bytes -> [(doc_id, text, lang)], validating the convention.

    Rejects loudly: non-tar payloads, members that are not regular
    files, names outside ``{12 digits}.{txt|lang}``, samples missing
    either member, and out-of-order keys (sequential readers rely on
    sample-adjacent members)."""
    try:
        tf = tarfile.open(fileobj=io.BytesIO(content), mode="r:")
    except tarfile.TarError as e:
        raise ValueError(f"not a tar shard: {e}") from e
    samples: dict[int, dict[str, str]] = {}
    last_key = -1
    with tf:
        for member in tf:
            if not member.isreg():
                raise ValueError(f"non-file member {member.name!r}")
            stem, dot, ext = member.name.partition(".")
            if not dot or ext not in ("txt", "lang") or not (
                len(stem) == 12 and stem.isdigit()
            ):
                raise ValueError(f"unexpected member name {member.name!r}")
            key = int(stem)
            if key < last_key:
                raise ValueError(
                    f"member {member.name!r} out of key order "
                    "(samples must be adjacent and sorted)"
                )
            last_key = key
            payload = tf.extractfile(member).read().decode("utf-8")
            samples.setdefault(key, {})[ext] = payload
    rows = []
    for key in sorted(samples):
        parts = samples[key]
        if set(parts) != {"txt", "lang"}:
            raise ValueError(
                f"sample {key} missing members (has {sorted(parts)})"
            )
        rows.append((key, parts["txt"], parts["lang"]))
    return rows


def pack_media_shard(rows: list[tuple[int, bytes]], ext: str = "qoi") -> bytes:
    """[(doc_id, payload_bytes)] -> deterministic tar bytes.

    The BINARY-member variant of ``pack_shard``: multimodal WebDataset
    shards carry encoded media (``{key}.jpg``/``.flac``/``.qoi``), not
    UTF-8 text, and tar stores payloads verbatim — this path certifies
    that no text-mode translation, padding slip or size-field error
    touches the bytes. Same pinned metadata, same sorted-key layout."""
    if not rows:
        raise ValueError("empty shard")
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for doc_id, payload in sorted(rows):
            info = tarfile.TarInfo(name=f"{doc_id:012d}.{ext}")
            info.size = len(payload)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            info.mode = 0o644
            tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def unpack_media_shard(
    content: bytes, ext: str = "qoi"
) -> list[tuple[int, bytes]]:
    """Tar bytes -> [(doc_id, payload_bytes)], validating the convention
    (regular files only, ``{12 digits}.{ext}`` names, sorted keys)."""
    try:
        tf = tarfile.open(fileobj=io.BytesIO(content), mode="r:")
    except tarfile.TarError as e:
        raise ValueError(f"not a tar shard: {e}") from e
    rows = []
    last_key = -1
    with tf:
        for member in tf:
            if not member.isreg():
                raise ValueError(f"non-file member {member.name!r}")
            stem, dot, mext = member.name.partition(".")
            if not dot or mext != ext or not (
                len(stem) == 12 and stem.isdigit()
            ):
                raise ValueError(f"unexpected member name {member.name!r}")
            key = int(stem)
            if key <= last_key:
                raise ValueError(
                    f"member {member.name!r} out of key order or duplicated"
                )
            last_key = key
            rows.append((key, tf.extractfile(member).read()))
    return rows
