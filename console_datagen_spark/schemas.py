"""Record schemas (SURVEY §1.1; reference DataGenerator.java:474-510).

The produced Kafka record: JSON key {storeId, operatorId, messageId},
nested JSON value {timestamp, user{...address, favoriteBeers[2]}, payload
(base64 of 500 bytes)}, two string headers X-Country / X-Animal.
"""

from __future__ import annotations

from pyspark.sql import types as T

KEY_SCHEMA = T.StructType(
    [
        T.StructField(f, T.StringType())
        for f in ("storeId", "operatorId", "messageId")
    ]
)

ADDRESS_SCHEMA = T.StructType(
    [
        T.StructField(f, T.StringType())
        for f in ("number", "street", "city", "region", "postalCode")
    ]
)

BEER_SCHEMA = T.StructType(
    [T.StructField("name", T.StringType()), T.StructField("style", T.StringType())]
)

USER_SCHEMA = T.StructType(
    [
        T.StructField("lastName", T.StringType()),
        T.StructField("firstName", T.StringType()),
        T.StructField("birthDate", T.StringType()),
        T.StructField("address", ADDRESS_SCHEMA),
        T.StructField("favoriteBeers", T.ArrayType(BEER_SCHEMA)),
    ]
)

VALUE_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.StringType()),
        T.StructField("user", USER_SCHEMA),
        T.StructField("payload", T.StringType()),
    ]
)

# Spark Kafka-sink row: key/value binary + headers array<struct<key,value>>
HEADERS_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("value", T.BinaryType()),
        ]
    )
)

COUNTER_SCHEMA = T.StructType(
    [
        T.StructField("cluster", T.StringType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("count", T.LongType()),
    ]
)
