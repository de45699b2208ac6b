"""Non-parquet format IO: CSV / JSON-lines / ORC round-trips, certified.

Every fixture table ships as parquet, but a production ingest reads the
formats crawls and logs actually arrive in. This tier certifies Spark's
text-format writers/readers LOSSLESSLY round-trip the documents corpus:
the query WRITES the table out in the format under test, READS it back,
and aggregates a content checksum per language — while the DuckDB
oracle computes the same checksum straight from the parquet. Any
quoting/escaping/type-coercion slip in either direction (a newline
swallowed, a quote doubled wrong, an int read as string) moves the
60-bit md5-prefix sum and fails the hash gate.

Checksum design: SUM over rows of (md5-prefix of 'doc_id|lang|source|
n_chars|text') mod 1e9+7 — each term < 2^30, so the BIGINT sum is exact
to ~2^33 rows per language slice; at 100 TB shard the checksum per
partition and re-sum (same algebra, still exact). Order-free by
construction; a single corrupted row moves the sum with probability
1 - 2^-30 per independent corruption.

Scale shape: one write + one read + one hash aggregate — all
distributed, no driver data path. The round-trip store lands under
/tmp (a deployment points it at the lake); each run overwrites.

Reference anchor: SURVEY §2.1 sources/sinks (the reference only speaks
Kafka; file formats are north-star ingest scope). Avro is a documented
N/A: the spark-avro datasource jar does not ship in this container.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views
from .registry import df_query

DOCS = ("documents",)

_ROUNDTRIP_ROOT = os.path.join(tempfile.gettempdir(), "cds_io_roundtrip")

# the per-row content fingerprint both engines compute identically;
# n_chars exercises a non-string type through each format's coercion
_ROW_STR_SPARK = (
    "concat_ws('|', CAST(doc_id AS STRING), lang, source, "
    "CAST(n_chars AS STRING), text)"
)
_ROW_STR_DUCK = (
    "concat_ws('|', CAST(doc_id AS VARCHAR), lang, source, "
    "CAST(n_chars AS VARCHAR), text)"
)

_ORACLE = (
    "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "CAST(SUM(n_chars) AS BIGINT) AS sum_chars, "
    f"CAST(SUM(('0x' || substr(md5({_ROW_STR_DUCK}), 1, 15))::BIGINT "
    "% 1000000007) AS BIGINT) AS content_sum "
    "FROM documents GROUP BY lang ORDER BY lang"
)


def _checksum(df: DataFrame) -> DataFrame:
    df.createOrReplaceTempView("io_rt")
    return df.sparkSession.sql(
        "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(n_chars) AS BIGINT) AS sum_chars, "
        f"CAST(SUM(CAST(conv(substr(md5({_ROW_STR_SPARK}), 1, 15), 16, 10) "
        "AS BIGINT) % 1000000007) AS BIGINT) AS content_sum "
        "FROM io_rt GROUP BY lang ORDER BY lang"
    )


_DOC_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)
_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _roundtrip(fmt: str, compression: str | None = None):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = register_views(spark, sf_dir, DOCS)["documents"].select(*_COLS)
        path = f"{_ROUNDTRIP_ROOT}/{fmt}" + (
            f"_{compression}" if compression else ""
        )
        w = docs.write.mode("overwrite").format(fmt)
        if compression:
            # real crawls arrive compressed (Common Crawl WET = gzip);
            # the reader auto-detects by extension (.gz/.bz2), so the
            # read side needs NO codec hint — that auto-detection is
            # part of what the round-trip certifies
            w = w.option("compression", compression)
        r = spark.read.format(fmt)
        if fmt == "csv":
            # full quoting discipline: header, quoted fields, escaped
            # quotes, and an explicit schema on read (inference would
            # re-type and re-order)
            w = w.option("header", True).option("quoteAll", True).option(
                "escape", '"'
            )
            r = r.option("header", True).option("escape", '"').schema(
                _DOC_SCHEMA
            )
        elif fmt == "json":
            r = r.schema(_DOC_SCHEMA)
        w.save(path)
        back = r.load(path).select(*_COLS)
        return _checksum(back)

    return run


for _fmt, _doc in (
    (
        "csv",
        "CSV sink+source round-trip (header, quoteAll, doubled-quote "
        "escape, explicit read schema): per-lang doc count, char sum and "
        "order-free 60-bit content checksum must equal the oracle's "
        "straight-from-parquet computation — certifies the quoting/"
        "escaping/typing loop a crawl ingest depends on",
    ),
    (
        "json",
        "JSON-lines sink+source round-trip (explicit read schema): the "
        "same per-lang content checksum as the CSV twin — certifies "
        "string escaping and BIGINT fidelity through the JSON writer/"
        "parser pair",
    ),
    (
        "orc",
        "ORC sink+source round-trip: the same per-lang content checksum "
        "— certifies the columnar non-parquet path (type mapping, "
        "dictionary/RLE encodings) Spark ships built-in",
    ),
):
    df_query(
        f"io_{_fmt}_roundtrip",
        _roundtrip(_fmt),
        oracle=_ORACLE,
        tables=DOCS,
        tags=("io", "formats", _fmt, "sink", "source"),
        doc=_doc,
    )


# Compressed-text ingest round-trips (VERDICT r13 #7): real crawls
# arrive as gzip/bzip2 CSV/JSONL, not bare files. Same checksum, same
# oracle — the checksum is format- and codec-independent; what these
# add to the certified surface is the codec loop (splittable-vs-not
# file handling, extension auto-detection on read). zstd-for-text is a
# documented environment N/A here: Spark's text codecs in this
# container are bzip2/deflate/gzip/lz4/snappy only (no native Hadoop
# zstd); at 100 TB prefer bzip2 ONLY when splittability matters more
# than CPU — gzip members are not splittable, so shard sizes must stay
# executor-friendly (the write side here shards by partition anyway).
for _fmt, _codec, _doc in (
    (
        "csv",
        "gzip",
        "gzip-compressed CSV sink+source round-trip (the Common Crawl "
        "WET shape): full quoting discipline THROUGH the codec plus "
        "extension auto-detection on read — per-lang content checksum "
        "vs the straight-from-parquet oracle",
    ),
    (
        "json",
        "bzip2",
        "bzip2-compressed JSON-lines sink+source round-trip: the "
        "splittable-codec path (a 100 TB ingest can parallelize WITHIN "
        "a .bz2 member, unlike gzip) — same checksum gate; zstd text "
        "codec is a documented environment N/A in this container",
    ),
):
    df_query(
        f"io_{_fmt}_{_codec}_roundtrip",
        _roundtrip(_fmt, _codec),
        oracle=_ORACLE,
        tables=DOCS,
        tags=("io", "formats", _fmt, _codec, "sink", "source"),
        doc=_doc,
    )


# ---- WebDataset tar shards (r14: the LLM training-data storage format) ----

_TAR_ROW_SPARK = "concat_ws('|', CAST(doc_id AS STRING), lang, text)"
_TAR_ROW_DUCK = "concat_ws('|', CAST(doc_id AS VARCHAR), lang, text)"
_TAR_DOCS_PER_SHARD = 64


def _io_tar_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> WebDataset tar shards -> unpack -> corpus checksum.

    One shard = one ``applyInPandas`` group (doc_id // 64): each task
    builds a REAL POSIX tar (operators/tar_shards.py — stdlib tarfile,
    pinned metadata so shards are content-addressable), a second Arrow
    kernel re-opens every shard and re-emits its samples, and the
    checksum aggregate must equal the oracle's straight-from-parquet
    sum — proving pack -> unpack is the identity across the member
    naming convention, UTF-8 payloads and the sidecar metadata member.
    At 100 TB this is the exact write path a multimodal training-data
    build runs: shards are embarrassingly parallel, sequential-read
    friendly, and the checksum algebra re-sums across shards."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ..operators.tar_shards import pack_shard, unpack_shard

    docs = register_views(spark, sf_dir, DOCS)["documents"].select(
        "doc_id", "text", "lang"
    )
    sharded = docs.withColumn(
        "shard", F.floor(F.col("doc_id") / _TAR_DOCS_PER_SHARD)
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        content = pack_shard(
            [
                (int(d), str(t), str(lg))
                for d, t, lg in zip(pdf["doc_id"], pdf["text"], pdf["lang"])
            ]
        )
        return pd.DataFrame(
            {"shard": [int(pdf["shard"].iloc[0])], "content": [content]}
        )

    shards = sharded.groupBy("shard").applyInPandas(
        _pack, schema="shard BIGINT, content BINARY"
    )

    def _unpack(batches):
        for pdf in batches:
            out_d, out_t, out_l = [], [], []
            for content in pdf["content"]:
                for doc_id, text, lang in unpack_shard(bytes(content)):
                    out_d.append(doc_id)
                    out_t.append(text)
                    out_l.append(lang)
            yield pd.DataFrame(
                {"doc_id": out_d, "text": out_t, "lang": out_l}
            )

    rt = shards.mapInPandas(
        _unpack, schema="doc_id BIGINT, text STRING, lang STRING"
    )
    rt.createOrReplaceTempView("tar_rt")
    return spark.sql(
        "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        f"CAST(SUM(CAST(conv(substr(md5({_TAR_ROW_SPARK}), 1, 15), 16, 10) "
        "AS BIGINT) % 1000000007) AS BIGINT) AS content_sum "
        "FROM tar_rt GROUP BY lang ORDER BY lang"
    )


df_query(
    "io_tar_shards_roundtrip",
    _io_tar_shards,
    oracle=(
        "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        f"CAST(SUM(('0x' || substr(md5({_TAR_ROW_DUCK}), 1, 15))::BIGINT "
        "% 1000000007) AS BIGINT) AS content_sum "
        "FROM documents GROUP BY lang ORDER BY lang"
    ),
    tables=DOCS,
    tags=("io", "formats", "tar", "webdataset", "pandas_udf"),
    doc="WebDataset-style tar shards (stdlib tarfile, pinned metadata "
    "=> content-addressable bytes): pack one shard per applyInPandas "
    "group -> re-open and re-emit every sample -> order-free corpus "
    "checksum equals the oracle's straight-from-parquet sum; the "
    "storage format multimodal training runs actually read",
)


# ---- ZIP shards (random-access counterpart to the tar path) ----------------


def _io_zip_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> STORED ZIP shards -> per-member directory reads ->
    corpus checksum.

    Same harness as the tar path, different access contract: ZIP's
    central directory gives sample-addressed loaders two-ranged-read
    random access. The unpack kernel reads every member INDIVIDUALLY
    through the directory (operators/zip_shards.py), so the checksum
    gate certifies every recorded member offset, not just a sequential
    stream. Shards are STORED with pinned DOS metadata — deterministic
    bytes (content-addressable) and exact ranged member reads."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ..operators.zip_shards import pack_zip_shard, unpack_zip_shard

    docs = register_views(spark, sf_dir, DOCS)["documents"].select(
        "doc_id", "text", "lang"
    )
    sharded = docs.withColumn(
        "shard", F.floor(F.col("doc_id") / _TAR_DOCS_PER_SHARD)
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        content = pack_zip_shard(
            [
                (int(d), str(t), str(lg))
                for d, t, lg in zip(pdf["doc_id"], pdf["text"], pdf["lang"])
            ]
        )
        return pd.DataFrame(
            {"shard": [int(pdf["shard"].iloc[0])], "content": [content]}
        )

    shards = sharded.groupBy("shard").applyInPandas(
        _pack, schema="shard BIGINT, content BINARY"
    )

    def _unpack(batches):
        for pdf in batches:
            out_d, out_t, out_l = [], [], []
            for content in pdf["content"]:
                for doc_id, text, lang in unpack_zip_shard(bytes(content)):
                    out_d.append(doc_id)
                    out_t.append(text)
                    out_l.append(lang)
            yield pd.DataFrame(
                {"doc_id": out_d, "text": out_t, "lang": out_l}
            )

    rt = shards.mapInPandas(
        _unpack, schema="doc_id BIGINT, text STRING, lang STRING"
    )
    rt.createOrReplaceTempView("zip_rt")
    return spark.sql(
        "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        f"CAST(SUM(CAST(conv(substr(md5({_TAR_ROW_SPARK}), 1, 15), 16, 10) "
        "AS BIGINT) % 1000000007) AS BIGINT) AS content_sum "
        "FROM zip_rt GROUP BY lang ORDER BY lang"
    )


df_query(
    "io_zip_shards_roundtrip",
    _io_zip_shards,
    oracle=(
        "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        f"CAST(SUM(('0x' || substr(md5({_TAR_ROW_DUCK}), 1, 15))::BIGINT "
        "% 1000000007) AS BIGINT) AS content_sum "
        "FROM documents GROUP BY lang ORDER BY lang"
    ),
    tables=DOCS,
    tags=("io", "formats", "zip", "random-access", "pandas_udf"),
    doc="ZIP training shards (stdlib zipfile, STORED members, pinned DOS "
    "metadata => deterministic content-addressable bytes): pack one "
    "shard per applyInPandas group -> re-read EVERY member via the "
    "central-directory seek path -> order-free corpus checksum equals "
    "the parquet oracle; the random-access shard shape dataset hubs "
    "ship and sample-addressed loaders read",
)


# ---- Gorilla-style timestamp compression (time-series block codec) ---------


def _ts_gorilla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> per-user delta-of-delta varint streams -> decode ->
    per-series stats, with the COMPRESSED SIZE certified by the oracle.

    The kernel (operators/ts_codec.py) encodes each user's sorted
    timestamp series as zigzag(delta-of-delta) LEB128 varints — the
    Gorilla/Prometheus block codec — decodes it back, asserts the
    decoded stream equals the input, and emits stats from the DECODED
    values plus the real byte length of the stream it built. The oracle
    recomputes everything from raw events: the byte count falls out of
    pure bit-length arithmetic (varint length = max(1,
    ceil(bitlen(zigzag(v))/7))), so a single slipped delta, zigzag sign
    or continuation bit moves n_bytes or the position-weighted checksum
    and fails the hash gate."""
    import pandas as pd

    from ..operators.ts_codec import decode_ts_stream, encode_ts_stream

    ev = register_views(spark, sf_dir, ("events",))["events"].select(
        "user_id", "event_id", "ts"
    )

    def _series_row(user_id: int, ts_us) -> tuple:
        epochs = [int(t) for t in ts_us]
        blob = encode_ts_stream(epochs)
        decoded = decode_ts_stream(blob)
        assert decoded == epochs  # lossless or die loudly
        n = len(decoded)
        checksum = (
            sum((i + 1) * t for i, t in enumerate(decoded)) % 1_000_000_007
        )
        return (user_id, n, len(blob), 8 * n, checksum, decoded[0], decoded[-1])

    _COLS = [
        "user_id",
        "n_events",
        "n_bytes",
        "raw_bytes",
        "ts_checksum",
        "ts_min",
        "ts_max",
    ]

    def per_partition(batches):
        # Sorted-partition streaming group walk: series keys are many and
        # small, so per-group applyInPandas pays one Arrow invocation per
        # key (measured 10+ s for 1.5k users at sf0.1); here the sort is
        # done by Spark, and ONE Python call per partition walks the key
        # boundaries. Arrow may split a key across batches, so the tail
        # key of each batch is carried into the next.
        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            uid = pdf["user_id"].to_numpy()
            ts_us = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            # boundaries of complete keys: everything before the last key
            # is complete inside this (carry + batch) frame
            last = uid[-1]
            cut = int((uid != last).sum()) if (uid != last).any() else 0
            rows = []
            if cut:
                head_uid, head_ts = uid[:cut], ts_us[:cut]
                starts = [0] + [
                    i
                    for i in range(1, cut)
                    if head_uid[i] != head_uid[i - 1]
                ] + [cut]
                for a, b in zip(starts[:-1], starts[1:]):
                    rows.append(_series_row(int(head_uid[a]), head_ts[a:b]))
            carry = pdf.iloc[cut:].reset_index(drop=True)
            if rows:
                yield pd.DataFrame(rows, columns=_COLS)
        if carry is not None and len(carry):
            uid = carry["user_id"].to_numpy()
            ts_us = (
                carry["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            )
            yield pd.DataFrame(
                [_series_row(int(uid[0]), ts_us)], columns=_COLS
            )

    out = (
        ev.repartition(32, "user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(
            per_partition,
            schema=(
                "user_id BIGINT, n_events BIGINT, n_bytes BIGINT, "
                "raw_bytes BIGINT, ts_checksum BIGINT, ts_min BIGINT, "
                "ts_max BIGINT"
            ),
        )
    )
    return out.orderBy("user_id")


df_query(
    "ts_gorilla_roundtrip",
    _ts_gorilla,
    oracle=(
        # epoch_us + LAG windows replay the value sequence (v1 = first
        # epoch, v2 = first delta, then delta-of-delta), zigzag is a
        # CASE, and the varint byte length is bit-length arithmetic —
        # the exact compressed size with no codec in sight
        "WITH e AS (SELECT user_id, epoch_us(ts) AS t, "
        "  ROW_NUMBER() OVER w AS rn, "
        "  epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS delta "
        "  FROM events "
        "  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        # dod needs LAG over delta, which is itself a LAG — two window
        # passes (engines reject nested window calls)
        "d2 AS (SELECT user_id, t, rn, delta, "
        "  delta - LAG(delta) OVER (PARTITION BY user_id ORDER BY rn) "
        "    AS dod FROM e), "
        "v AS (SELECT user_id, t, rn, "
        "  CASE WHEN rn = 1 THEN t WHEN rn = 2 THEN delta ELSE dod END AS val "
        "  FROM d2), "
        "z AS (SELECT user_id, t, rn, "
        "  CASE WHEN val >= 0 THEN 2 * val ELSE -2 * val - 1 END AS zz "
        "  FROM v) "
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, "
        "CAST(SUM(GREATEST(1, (LENGTH(bin(zz)) + 6) // 7)) AS BIGINT) "
        "  AS n_bytes, "
        "CAST(8 * COUNT(*) AS BIGINT) AS raw_bytes, "
        "CAST(SUM(rn * t) % 1000000007 AS BIGINT) AS ts_checksum, "
        "CAST(MIN(t) AS BIGINT) AS ts_min, CAST(MAX(t) AS BIGINT) AS ts_max "
        "FROM z GROUP BY user_id ORDER BY user_id"
    ),
    tables=("events",),
    tags=("io", "timeseries", "gorilla", "codec", "pandas_udf"),
    doc="Gorilla-style timestamp compression (delta-of-delta + zigzag + "
    "LEB128 varint, the Prometheus TSDB block codec): per-user encode -> "
    "decode -> stats from the decoded stream, with the EXACT compressed "
    "byte count certified by the oracle's bit-length arithmetic and the "
    "decode identity by the position-weighted checksum",
)


# ---- multimodal tar shards: QOI payloads through WebDataset ----------------


def _io_tar_qoi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full multimodal storage path, composed end to end: synthesize
    pixels -> QOI-encode -> pack BINARY members into WebDataset tar
    shards -> unpack -> QOI-decode -> pixel stats. The existing tar gate
    carries UTF-8 text only; multimodal training shards carry encoded
    media, and a text-mode translation, tar size-field slip or padding
    error would corrupt them silently — here any such slip breaks the
    QOI magic/CRC-less framing or moves the position-weighted pixel
    checksum against the same window-prefix-sum oracle mm_image_qoi
    uses. One shard = one task at any scale; the shard bytes are
    content-addressable (pinned tar metadata over deterministic QOI
    bytes)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from ..operators.qoi import decode_qoi, encode_qoi
    from ..operators.tar_shards import pack_media_shard, unpack_media_shard
    from .extras import _qoi_synth_px

    docs = register_views(spark, sf_dir, DOCS)["documents"].select("doc_id")
    # The shuffle rows are tiny (doc_id, shard) so AQE coalesces the
    # groupBy exchange to ONE partition and every CPU-heavy pack kernel
    # (synth + QOI encode) runs in a single task (measured 17 s vs ~2 s).
    # An explicit numbered repartition on the group key satisfies the
    # applyInPandas distribution requirement and is not AQE-coalesced.
    sharded = docs.withColumn(
        "shard", F.floor(F.col("doc_id") / _TAR_DOCS_PER_SHARD)
    ).repartition(32, "shard")

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = [
            (int(d), encode_qoi(_qoi_synth_px(int(d))))
            for d in pdf["doc_id"]
        ]
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "content": [pack_media_shard(rows)],
            }
        )

    shards = sharded.groupBy("shard").applyInPandas(
        _pack, schema="shard BIGINT, content BINARY"
    ).repartition(32)

    def _unpack(batches):
        for pdf in batches:
            out = []
            for content in pdf["content"]:
                for doc_id, payload in unpack_media_shard(bytes(content)):
                    decoded, meta = decode_qoi(payload)
                    px = decoded.reshape(-1, 3).astype(np.int64)
                    p = np.arange(px.shape[0], dtype=np.int64)
                    packed = px[:, 0] * 65536 + px[:, 1] * 256 + px[:, 2]
                    out.append(
                        (
                            doc_id,
                            meta["width"],
                            meta["height"],
                            int((p * packed).sum()),
                            int(px[:, 0].sum()),
                            int(px[:, 1].sum()),
                            int(px[:, 2].sum()),
                            1,
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "px_posw",
                    "r_sum",
                    "g_sum",
                    "b_sum",
                    "roundtrip_ok",
                ],
            )

    rt = shards.mapInPandas(
        _unpack,
        schema=(
            "doc_id BIGINT, width INT, height INT, px_posw BIGINT, "
            "r_sum BIGINT, g_sum BIGINT, b_sum BIGINT, roundtrip_ok INT"
        ),
    )
    return rt.orderBy("doc_id")


def _tar_qoi_oracle() -> str:
    from .extras import _qoi_oracle

    return _qoi_oracle()


df_query(
    "io_tar_qoi_shards_roundtrip",
    _io_tar_qoi,
    oracle=_tar_qoi_oracle(),
    tables=DOCS,
    tags=("io", "formats", "tar", "webdataset", "qoi", "multimodal"),
    doc="multimodal WebDataset shards with BINARY members: pixels -> "
    "QOI encode -> tar pack (pinned metadata) -> unpack -> QOI decode "
    "-> position-weighted pixel checksum vs the window-prefix-sum "
    "oracle — the composed storage+codec path a multimodal training "
    "build runs, certifying byte-verbatim media members where the text "
    "tar gate only certifies UTF-8",
)
