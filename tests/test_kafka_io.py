"""Kafka IO + engine facade: plan construction and record parsing.

No broker in the container — sources are validated at plan level, and
parse_records runs over generator output shaped like Kafka wire rows.
"""

import pytest
from pyspark.sql import functions as F

from console_datagen_spark.config import DataGenConfig
from console_datagen_spark.engine import DataGenEngine
from console_datagen_spark.sources.generator import generate_batch, to_kafka_rows
from console_datagen_spark.sources.kafka_io import (
    envelope,
    kafka_source,
    parse_records,
    share_group_source,
)


def fake_wire(spark, n=50):
    """Generator output reshaped into the Kafka source schema."""
    kdf = to_kafka_rows(generate_batch(spark, n))
    return kdf.select(
        "key",
        "value",
        "topic",
        F.pmod(F.xxhash64("key"), F.lit(4)).cast("int").alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"),
        "headers",
    )


def test_kafka_source_plan_builds(spark):
    try:
        df = kafka_source(
            spark,
            "localhost:9092",
            topics=["t1", "t2"],
            group_id="console-datagen-group-consumer-0",
        )
    except Exception as exc:  # noqa: BLE001
        if "Failed to find data source: kafka" in str(exc):
            pytest.skip("spark-sql-kafka connector jar not deployed here")
        raise
    assert df.isStreaming
    cols = set(df.columns)
    assert {"key", "value", "topic", "partition", "offset", "headers"} <= cols


def test_kafka_source_requires_exactly_one_subscription(spark):
    with pytest.raises(ValueError):
        kafka_source(spark, "b:9092")
    with pytest.raises(ValueError):
        kafka_source(spark, "b:9092", topics=["t"], topic_pattern="t.*")


def test_share_group_documented_na():
    # without a client factory only the wire-protocol N/A remains; the
    # emulated transport is certified in test_share_group.py
    with pytest.raises(NotImplementedError, match="wire protocol"):
        share_group_source(None)


def test_envelope_projection(spark):
    env = envelope(fake_wire(spark))
    assert env.columns == ["topic", "partition", "offset", "timestamp"]


def test_parse_records_roundtrip(spark):
    parsed = parse_records(fake_wire(spark, 20)).orderBy("offset")
    rows = parsed.collect()
    assert len(rows) == 20
    r = rows[0]
    # typed key/value structs recovered from wire bytes
    assert r.key.storeId and r.key.messageId
    assert r.value.user.address.city
    assert len(r.value.user.favoriteBeers) == 2
    assert len(bytes(r.payload_bytes)) == 500
    assert set(r.headers.keys()) == {"X-Country", "X-Animal"}


def test_topology_elaboration(spark):
    eng = DataGenEngine(
        spark,
        DataGenConfig(
            consumer_group_count=2,
            share_group_count=1,
            streams_group_count=1,
            topics_per_member=2,
            compression_types=("none", "gzip"),
        ),
    )
    topo = eng.topology()
    assert len(topo.producers) == 4  # 2 + 1 + 1 groups
    assert len(topo.consumers) == 4
    # per-group compression round robin
    assert [p.compression for p in topo.producers if p.group_type == "consumer"] == [
        "none",
        "gzip",
    ]
    # consumer group ids follow the reference pattern
    assert topo.consumers[0].group_id == "console-datagen-group-consumer-0"
    # topics are the per-group slices of the namespace
    assert topo.producers[0].topics == [
        "console_datagen_000-consumer-a",
        "console_datagen_000-consumer-b",
    ]
    assert topo.producers[1].topics == [
        "console_datagen_001-consumer-a",
        "console_datagen_001-consumer-b",
    ]
    assert len(topo.all_topics) == 8


def test_producer_stream_plan(spark):
    eng = DataGenEngine(spark)
    plan = eng.topology().producers[0]
    rec = eng.producer_stream(plan)
    assert rec.isStreaming
    assert set(rec.columns) == {"key", "value", "headers", "topic"}


def test_initialize_requires_bootstrap(spark):
    with pytest.raises(ValueError, match="bootstrap_servers"):
        DataGenEngine(spark).initialize()


def test_initialize_gated_without_kafka_lib(spark):
    # kafka-python absent → initialize reports None instead of crashing
    assert DataGenEngine(spark, bootstrap_servers="b:9092").initialize() is None
