"""Multimodal (image/audio/video) column operators — north-star surface.

Design for 100 TB media pipelines: media travels as an opaque ``binary``
column plus a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` operators so each task
streams batches without materializing a partition in memory. Partitioning
is by content hash, so media of wildly different sizes spread evenly.

The actual codecs (PIL / librosa / ffmpeg) are NOT in this container, so
the decode kernels are deterministic fakes behind ``_decode_bytes`` —
clearly marked, swappable via constructor injection. Everything
Spark-side (schemas, UDF signatures, batch iteration, determinism) is
real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "doc_id BIGINT, media_type STRING, fmt STRING, n_bytes INT, content BINARY"
)
FEATURE_DIM = 4
FEATURES_SCHEMA = (
    "doc_id BIGINT, media_type STRING, fmt STRING, n_bytes INT, "
    f"feature ARRAY<DOUBLE>"
)
FRAMES_SCHEMA = "doc_id BIGINT, frame_idx INT, frame BINARY"

_FORMATS = {"image": ("png", "jpeg"), "audio": ("wav", "flac"), "video": ("mp4", "webm")}


def synth_media(documents: DataFrame, media_type: str = "image", n_bytes: int = 256) -> DataFrame:
    """Attach a deterministic fake binary payload + metadata to each doc.

    Stands in for a real binary column read from parquet/tar shards; the
    bytes are an md5 chain of (doc_id, i) so every layer downstream is
    reproducible and partition-invariant.
    """
    fmts = _FORMATS[media_type]
    n_blocks = (n_bytes + 15) // 16
    content = F.unhex(
        F.substring(
            F.concat_ws(
                "",
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_blocks - 1)),
                    lambda i: F.md5(
                        F.concat_ws(":", F.col("doc_id").cast("string"), i.cast("string"))
                    ),
                ),
            ),
            1,
            n_bytes * 2,
        )
    )
    return documents.select(
        "doc_id",
        F.lit(media_type).alias("media_type"),
        F.element_at(
            F.array(*[F.lit(x) for x in fmts]),
            F.pmod(F.col("doc_id"), F.lit(len(fmts))).cast("int") + 1,
        ).alias("fmt"),
        F.lit(n_bytes).alias("n_bytes"),
        content.alias("content"),
    )


def _decode_bytes(content: bytes, fmt: str) -> np.ndarray:
    """STUB decode kernel — deterministic fake.

    A real deployment replaces this with PIL.Image.open / soundfile /
    pyav frame decode; the container has none of those, so we emit a
    stable FEATURE_DIM-vector derived from the bytes (chunk means scaled
    to [0,1]). Raises on empty payloads like a real decoder would.
    """
    if not content:
        raise ValueError("empty media payload")
    arr = np.frombuffer(content, dtype=np.uint8)
    chunks = np.array_split(arr, FEATURE_DIM)
    return np.array([float(c.mean()) / 255.0 for c in chunks])


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched).

    The kernel touches each batch exactly once and yields a same-length
    frame — the shape a real vision/audio encoder (or a GPU inference
    stage) plugs into.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_bytes(bytes(c), f).tolist()
                for c, f in zip(pdf["content"], pdf["fmt"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "fmt": pdf["fmt"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(kernel, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, frame_bytes: int = 32, stride: int = 2) -> DataFrame:
    """Frame-sample a "video" payload: split into frame_bytes chunks, keep
    every ``stride``-th — one output row per sampled frame (explode shape).

    Real impl: pyav keyframe iteration; the chunking stands in for it.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_frame = [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                raw = bytes(content)
                frames = [
                    raw[o : o + frame_bytes]
                    for o in range(0, len(raw), frame_bytes)
                ]
                for i in range(0, len(frames), stride):
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_frame.append(frames[i])
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_idx": out_idx, "frame": out_frame}
            )

    return media.mapInPandas(kernel, schema=FRAMES_SCHEMA)


AUDIO_SCHEMA = "doc_id BIGINT, win_idx INT, energy_permille BIGINT, low_energy INT"


def audio_energy_windows(
    media: DataFrame,
    window_bytes: int = 64,
    hop_bytes: int = 32,
    low_permille: int = 480,
) -> DataFrame:
    """Sliding-window energy analysis over an "audio" byte stream — the
    audio analog of ``sample_frames``: one row per (doc, window) with the
    window's mean-amplitude permille and a low-energy (silence-candidate)
    flag. Real impl swaps the byte-mean for an RMS over decoded PCM
    samples (soundfile/librosa); the windowing, hop arithmetic and Arrow
    batch shape are exactly what that kernel plugs into.

    Integer permille (floor) so the output is hash-exact cross-engine;
    only COMPLETE windows are emitted (a real VAD pads or drops the tail
    — dropping is the deterministic choice).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        denom = 255 * window_bytes
        for pdf in batches:
            out_doc, out_idx, out_en, out_low = [], [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                arr = np.frombuffer(bytes(content), dtype=np.uint8)
                w = 0
                while w * hop_bytes + window_bytes <= len(arr):
                    s = int(arr[w * hop_bytes : w * hop_bytes + window_bytes].sum())
                    en = s * 1000 // denom
                    out_doc.append(doc_id)
                    out_idx.append(w)
                    out_en.append(en)
                    out_low.append(1 if en < low_permille else 0)
                    w += 1
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "win_idx": out_idx,
                    "energy_permille": out_en,
                    "low_energy": out_low,
                }
            )

    return media.mapInPandas(kernel, schema=AUDIO_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize — NOT available without a codec library.

    Kept as an explicit, importable operator so the API surface is
    complete; raises immediately rather than silently no-oping.
    """
    raise NotImplementedError(
        "resize requires an image codec (PIL/opencv); not present in this "
        "environment — plug a kernel into mapInPandas like extract_features"
    )


def media_fingerprint(media: DataFrame) -> DataFrame:
    """Content-hash dedup key for binary media (sha256 via JVM built-in)."""
    return media.select(
        "doc_id", F.sha2(F.col("content"), 256).alias("content_sha256")
    )


def _fake_decode_reference(content: bytes) -> list[float]:
    """Reference impl of the fake decode for tests (pure Python)."""
    arr = list(content)
    n = len(arr)
    out = []
    base = n // FEATURE_DIM
    rem = n % FEATURE_DIM
    start = 0
    for i in range(FEATURE_DIM):
        size = base + (1 if i < rem else 0)
        chunk = arr[start : start + size]
        out.append(sum(chunk) / len(chunk) / 255.0)
        start += size
    return out


def _md5_chain_bytes(doc_id: int, n_bytes: int) -> bytes:
    """Python twin of synth_media's byte derivation (for tests)."""
    n_blocks = (n_bytes + 15) // 16
    hexes = "".join(
        hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest() for i in range(n_blocks)
    )
    return bytes.fromhex(hexes[: n_bytes * 2])


def extract_features_permille(media: DataFrame) -> DataFrame:
    """Hash-checkable twin of ``extract_features``: integer-permille chunk
    means via pure integer arithmetic (sum*1000 // (n*255)), serialized to
    a comma-joined string. Exact in any engine — this is what lets the
    DuckDB oracle certify the mapInPandas decode path itself, not just its
    row count. Same Arrow-batched kernel shape as the float path.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for c in pdf["content"]:
                arr = np.frombuffer(bytes(c), dtype=np.uint8)
                chunks = np.array_split(arr, FEATURE_DIM)
                feats.append(
                    ",".join(
                        str(int(ch.sum(dtype=np.int64)) * 1000 // (len(ch) * 255))
                        for ch in chunks
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"],
                    "feature_permille": feats,
                }
            )

    return media.mapInPandas(
        kernel, schema="doc_id BIGINT, n_bytes INT, feature_permille STRING"
    )
