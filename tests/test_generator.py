"""Generator conformance (SURVEY §1.1 schemas, §2.2 G1-G10)."""

import base64
import json

import pytest
from pyspark.sql import functions as F

from console_datagen_spark.functions.rate import (
    RATE_MEAN,
    RATE_VALUES,
    rate_for_millis_py,
)
from console_datagen_spark.schemas import KEY_SCHEMA, VALUE_SCHEMA
from console_datagen_spark.sources.generator import (
    PAYLOAD_BYTES,
    generate_batch,
    to_kafka_rows,
)


@pytest.fixture(scope="module")
def records(spark):
    return generate_batch(spark, 100).cache()


def test_key_schema_roundtrip(spark, records):
    parsed = records.select(
        F.from_json("key_json", KEY_SCHEMA).alias("k")
    ).select("k.*")
    assert parsed.schema.fieldNames() == ["storeId", "operatorId", "messageId"]
    row = parsed.first()
    assert all(v is not None for v in row.asDict().values())


def test_value_schema_roundtrip(spark, records):
    parsed = records.select(F.from_json("value_json", VALUE_SCHEMA).alias("v"))
    # no field may be null after parsing — proves the JSON matches the schema
    nulls = parsed.where(
        F.col("v.timestamp").isNull()
        | F.col("v.user.lastName").isNull()
        | F.col("v.user.address.city").isNull()
        | F.col("v.payload").isNull()
        | (F.size("v.user.favoriteBeers") != 2)
    ).count()
    assert nulls == 0


def test_payload_is_500_bytes(records):
    val = json.loads(records.first().value_json)
    raw = base64.b64decode(val["payload"])
    assert len(raw) == PAYLOAD_BYTES
    # base64 must be unchunked (no MIME line breaks)
    assert "\r" not in val["payload"] and "\n" not in val["payload"]


def test_round_robin_topics(records):
    counts = {r.topic: r.cnt for r in records.groupBy("topic").agg(
        F.count("*").alias("cnt")).collect()}
    assert len(counts) == 3
    assert set(counts.values()) <= {33, 34}  # 100 rows over 3 topics


def test_partition_invariance(spark):
    """Same (seed, id) → same record regardless of parallelism."""
    a = generate_batch(spark, 60).coalesce(1).orderBy("record_id").collect()
    b = (
        generate_batch(spark, 60)
        .repartition(7)
        .orderBy("record_id")
        .collect()
    )
    assert a == b


def test_determinism_across_sessions(records, spark):
    again = generate_batch(spark, 100).orderBy("record_id").collect()
    assert again == records.orderBy("record_id").collect()


def test_kafka_row_shape(spark, records):
    kdf = to_kafka_rows(records)
    s = dict(zip(kdf.schema.fieldNames(), [f.dataType.simpleString() for f in kdf.schema.fields]))
    assert s["key"] == "binary"
    assert s["value"] == "binary"
    assert s["topic"] == "string"
    assert s["headers"].startswith("array<struct<key:string,value:binary")
    row = kdf.first()
    assert [h.key for h in row.headers] == ["X-Country", "X-Animal"]


def test_rate_law_values():
    ticks = [rate_for_millis_py(1_704_067_200_000 + s * 1000) for s in range(50)]
    assert set(ticks) == set(RATE_VALUES)
    assert sum(ticks) / len(ticks) == RATE_MEAN
    # 10 s plateaus: each value held for 10 consecutive seconds
    for i in range(0, 50, 10):
        assert len(set(ticks[i : i + 10])) == 1
