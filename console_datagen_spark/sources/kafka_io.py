"""Kafka source builders + record parsing (SURVEY §2.1 S2/S4, §1.1).

Consumer-side mapping of the reference:
- S2 classic consumer-group loop (DataGenerator.java:162-170, 395-409) →
  ``readStream.format("kafka")`` with subscribe/subscribePattern; Spark
  manages group membership internally (set ``kafka.group.id`` to pin the
  reference's deterministic group naming).
- S4 Kafka Streams topology (DataGenerator.java:182-193, 413-449) → the
  same source + the ``envelope`` projection; the reference's processor
  only extracts (topic, partition, offset), which is P1.
- S3 share groups (DataGenerator.java:172-180): see ``share_group_source``.

The reference never parses consumed bytes (ByteArrayDeserializer both
sides, AP:22-25); ``parse_records`` is the beyond-reference path that
turns the wire bytes back into typed columns via from_json.

Scale: the Kafka source parallelizes by topic-partition; ``minPartitions``
can oversplit hot partitions. All projections here are codegen'd column
ops — no Python between broker and counter state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import kafka_stream_options
from ..schemas import KEY_SCHEMA, VALUE_SCHEMA


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: list[str] | None = None,
    topic_pattern: str | None = None,
    starting_offsets: str = "earliest",
    client_config: dict[str, str] | None = None,
    group_id: str | None = None,
    include_headers: bool = True,
    min_partitions: int | None = None,
) -> DataFrame:
    """Streaming Kafka source (S2). Exactly one of topics/topic_pattern."""
    if (topics is None) == (topic_pattern is None):
        raise ValueError("provide exactly one of topics / topic_pattern")
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("startingOffsets", starting_offsets)
        .option("includeHeaders", str(include_headers).lower())
    )
    if topics is not None:
        reader = reader.option("subscribe", ",".join(topics))
    else:
        reader = reader.option("subscribePattern", topic_pattern)
    if group_id:
        reader = reader.option("kafka.group.id", group_id)
    if min_partitions:
        reader = reader.option("minPartitions", str(min_partitions))
    for k, v in kafka_stream_options(client_config or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def kafka_batch_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: list[str],
    client_config: dict[str, str] | None = None,
) -> DataFrame:
    """Bounded Kafka read (backfill / reprocessing path)."""
    reader = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", ",".join(topics))
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
    )
    for k, v in kafka_stream_options(client_config or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def share_group_source(
    spark: SparkSession,
    client_factory: str | None = None,
    client_kwargs: dict | None = None,
    max_poll_records: int = 500,
) -> DataFrame:
    """S3: Kafka 4.x share groups (queue semantics, per-record ack).

    The reference's share-group consumer runs the identical count loop as
    S2 with a queue-semantics client (DataGenerator.java:172-180 →
    537-546). The engine emulates those semantics end-to-end via
    ``sources.share_group``: a lease/ack ``ShareClient`` protocol plugged
    into a Python DataSource stream whose micro-batch commit acknowledges
    each record (see that module for the at-least-once contract). Pass
    ``client_factory`` as an importable ``'module:callable'`` returning a
    ShareClient — e.g. the built-in spool transport
    ``'console_datagen_spark.sources.share_group:FileSpoolShareClient'``.

    Only the share-group *wire protocol* remains N/A: KafkaShareConsumer
    (KIP-932) is Java-only, so no factory can speak to a real broker's
    share coordinator from Python yet; calling without a factory raises
    with that explanation rather than pretending parity.
    """
    if client_factory is None:
        raise NotImplementedError(
            "no Python client speaks the share-group wire protocol "
            "(KIP-932 is Java-only); pass client_factory= for the "
            "emulated transport, or use kafka_source (classic group) — "
            "counting semantics downstream are identical"
        )
    from .share_group import ShareGroupDataSource

    spark.dataSource.register(ShareGroupDataSource)
    import json as _json

    return (
        spark.readStream.format("kafka_share")
        .option("client_factory", client_factory)
        .option("client_kwargs", _json.dumps(client_kwargs or {}))
        .option("max_poll_records", str(max_poll_records))
        .load()
    )


def share_group_source_partitioned(
    spark: SparkSession,
    client_factory: str | None = None,
    client_kwargs: dict | None = None,
    max_poll_records: int = 500,
) -> DataFrame:
    """S3 at scale: partition-parallel share-group source.

    Same options and downstream envelope as ``share_group_source``, but
    the driver only does lease ACCOUNTING (metadata acquire via the
    client's ``lease_batch``), grouped into one input split per Kafka
    (topic, partition); executors read the payloads in parallel — the
    same driver-plans/executors-fetch split as Spark's built-in Kafka
    source. See ``sources.share_group.ShareGroupPartitionedReader``.
    """
    if client_factory is None:
        raise NotImplementedError(
            "no Python client speaks the share-group wire protocol "
            "(KIP-932 is Java-only); pass client_factory= for the "
            "emulated transport"
        )
    from .share_group import SharePartitionedDataSource

    spark.dataSource.register(SharePartitionedDataSource)
    import json as _json

    return (
        spark.readStream.format("kafka_share_partitioned")
        .option("client_factory", client_factory)
        .option("client_kwargs", _json.dumps(client_kwargs or {}))
        .option("max_poll_records", str(max_poll_records))
        .load()
    )


def envelope(records: DataFrame) -> DataFrame:
    """P1: project the consumption envelope (topic, partition, offset, ts).

    This is everything the reference's consumers look at
    (DataGenerator.java:431-438, 537-545).
    """
    return records.select("topic", "partition", "offset", "timestamp")


def parse_records(records: DataFrame) -> DataFrame:
    """Beyond-reference: decode wire bytes into typed columns.

    Input: Spark Kafka schema (key/value binary, headers, envelope).
    Output: envelope + parsed key/value structs + header map.
    """
    out = records.select(
        "topic",
        "partition",
        "offset",
        F.from_json(F.col("key").cast("string"), KEY_SCHEMA).alias("key"),
        F.from_json(F.col("value").cast("string"), VALUE_SCHEMA).alias("value"),
        *(
            [
                F.map_from_entries(
                    F.transform(
                        F.col("headers"),
                        lambda h: F.struct(
                            h["key"].alias("key"),
                            h["value"].cast("string").alias("value"),
                        ),
                    )
                ).alias("headers")
            ]
            if "headers" in records.columns
            else []
        ),
    )
    return out.withColumn("payload_bytes", F.unbase64(F.col("value.payload")))
