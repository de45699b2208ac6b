"""ZIP training-data shards — the random-access counterpart to tar.

WebDataset tars (operators/tar_shards.py) are the *sequential* shard
format: members stream in order, no index. ZIP is the *random-access*
one — a central directory at end-of-archive maps every member name to
its byte offset, so a loader can fetch one sample from an object store
with two ranged reads (directory + member) instead of scanning the
shard. Dataset hubs ship exactly this shape (zipped image/text folders),
and sample-addressed training loaders want it. Stdlib ``zipfile`` only:

- ``pack_zip_shard(rows)``: documents -> deterministic ZIP bytes.
  Members are STORED (no compression) with pinned DOS timestamp and
  attributes, emitted in sorted key order, so identical content yields
  identical bytes — the same content-addressability property the tar
  packer pins (DEFLATE would tie the bytes to a zlib version; parquet
  already compressed the payloads upstream, and stored members are what
  makes ranged member reads exact).
- ``unpack_zip_shard(content)``: ZIP bytes -> rows, reading every
  member INDIVIDUALLY through the central directory (``ZipFile.open``
  per name, the seek path a random-access loader uses) — a full unpack
  therefore certifies every directory offset, not just the stream.
- ``read_member(content, doc_id, ext)``: the two-ranged-read access
  pattern itself, for loaders that want one sample.

Validation is loud, mirroring the tar reader: non-zip payloads, member
names outside ``{12 digits}.{txt|lang}``, samples missing either
member, out-of-order directory entries, and non-STORED members are all
rejected with specific errors.

Scale shape: one shard = one ``applyInPandas`` group; packing is
embarrassingly parallel with no driver involvement, and the certified
query's checksum algebra re-sums across shards exactly like the tar
path.
"""

from __future__ import annotations

import io
import zipfile

_EXTS = ("txt", "lang")
# DOS epoch — the earliest timestamp ZIP can represent; pinned so bytes
# are a pure function of content.
_PINNED_DT = (1980, 1, 1, 0, 0, 0)


def pack_zip_shard(rows: list[tuple[int, str, str]]) -> bytes:
    """[(doc_id, text, lang)] -> deterministic STORED ZIP bytes."""
    if not rows:
        raise ValueError("empty shard")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, mode="w", compression=zipfile.ZIP_STORED) as zf:
        for doc_id, text, lang in sorted(rows):
            for ext, payload in zip(_EXTS, (text, lang)):
                info = zipfile.ZipInfo(
                    filename=f"{doc_id:012d}.{ext}", date_time=_PINNED_DT
                )
                info.compress_type = zipfile.ZIP_STORED
                info.external_attr = 0o644 << 16
                info.create_system = 3  # unix, pinned (host-dependent otherwise)
                zf.writestr(info, payload.encode("utf-8"))
    return buf.getvalue()


def _open_zip(content: bytes) -> zipfile.ZipFile:
    try:
        return zipfile.ZipFile(io.BytesIO(content), mode="r")
    except zipfile.BadZipFile as e:
        raise ValueError(f"not a zip shard: {e}") from e


def _check_name(name: str) -> tuple[int, str]:
    stem, dot, ext = name.partition(".")
    if not dot or ext not in _EXTS or not (len(stem) == 12 and stem.isdigit()):
        raise ValueError(f"unexpected member name {name!r}")
    return int(stem), ext


def unpack_zip_shard(content: bytes) -> list[tuple[int, str, str]]:
    """ZIP bytes -> [(doc_id, text, lang)] via per-member directory reads."""
    with _open_zip(content) as zf:
        samples: dict[int, dict[str, str]] = {}
        last_key = -1
        for info in zf.infolist():
            key, ext = _check_name(info.filename)
            if info.compress_type != zipfile.ZIP_STORED:
                raise ValueError(
                    f"member {info.filename!r} is compressed; shards are "
                    "STORED for exact ranged reads"
                )
            if key < last_key:
                raise ValueError(
                    f"member {info.filename!r} out of key order "
                    "(directory must list samples adjacent and sorted)"
                )
            last_key = key
            # per-member open: the central-directory seek path, so a
            # full unpack certifies every recorded offset
            with zf.open(info.filename) as fh:
                samples.setdefault(key, {})[ext] = fh.read().decode("utf-8")
    rows = []
    for key in sorted(samples):
        parts = samples[key]
        if set(parts) != set(_EXTS):
            raise ValueError(f"sample {key} missing members (has {sorted(parts)})")
        rows.append((key, parts["txt"], parts["lang"]))
    return rows


def read_member(content: bytes, doc_id: int, ext: str) -> str:
    """One sample via the random-access path a loader would use."""
    if ext not in _EXTS:
        raise ValueError(f"unknown extension {ext!r}")
    with _open_zip(content) as zf:
        try:
            with zf.open(f"{doc_id:012d}.{ext}") as fh:
                return fh.read().decode("utf-8")
        except KeyError as e:
            raise ValueError(f"no member for doc {doc_id}.{ext}") from e
