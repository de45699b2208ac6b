"""Streaming record generation (SURVEY §3.2): rate source → sawtooth
thinning → record projection → Kafka (or test) sink.

Design: the ``rate-micro-batch`` source emits the *peak* rate (410 rows per
1 s batch per producer); the sawtooth is applied declaratively by keeping
row i of a tick iff i < rate(tick_ms). This keeps generation fully
declarative (no driver-side scheduling loop like the reference's
sleep-to-boundary pacing, DataGenerator.java:528-534) and exactly
reproduces the per-tick record counts {10,110,210,310,410}.

Scale: one streaming query per (cluster, compression-class) — mirroring
the reference's producer-per-group topology (SURVEY §3.1) — each query
parallelized by Spark over the rate source's partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import DataStreamWriter

from ..config import DataGenConfig, kafka_stream_options
from ..functions.rate import RATE_PEAK, rate_for_millis
from ..naming import all_topic_names
from ..sources.generator import gen_select_exprs, to_kafka_rows


def rate_stream(
    spark: SparkSession,
    rows_per_second: int = RATE_PEAK,
    num_partitions: int = 4,
    micro_batch: bool = True,
) -> DataFrame:
    """Peak-rate tick stream: columns (timestamp, value)."""
    fmt = "rate-micro-batch" if micro_batch else "rate"
    reader = (
        spark.readStream.format(fmt)
        .option("numPartitions", str(num_partitions))
    )
    if micro_batch:
        reader = reader.option("rowsPerBatch", str(rows_per_second))
    else:
        reader = reader.option("rowsPerSecond", str(rows_per_second))
    return reader.load()


def sawtooth_thin(ticks: DataFrame) -> DataFrame:
    """Keep row i of each 1-second tick iff i < rate(tick_millis).

    ``value`` is globally monotone, so ``value % RATE_PEAK`` is the row's
    index within its tick; the filter is a pure column predicate (pushed
    into the scan, no shuffle).
    """
    tick_ms = (F.unix_millis(F.col("timestamp")) / 1000).cast("long") * 1000
    return ticks.where(
        F.pmod(F.col("value"), F.lit(RATE_PEAK)) < rate_for_millis(tick_ms)
    )


def records_stream(
    spark: SparkSession,
    config: DataGenConfig | None = None,
    group_type: str = "consumer",
    group: int = 0,
    num_partitions: int = 4,
    micro_batch: bool = True,
) -> DataFrame:
    """Streaming DataFrame of generated records in Kafka-sink shape."""
    config = config or DataGenConfig()
    topics = all_topic_names(
        config.consumer_group_count,
        config.share_group_count,
        config.streams_group_count,
        config.topics_per_member,
        config.topic_pattern,
    )
    thinned = sawtooth_thin(
        rate_stream(spark, RATE_PEAK, num_partitions, micro_batch)
    )
    exprs = gen_select_exprs("spark", topics, id_col="value")
    # streaming mode: the record timestamp is the wall clock, as in the
    # reference (DataGenerator.java:483) — swap the deterministic batch ts.
    records = thinned.selectExpr(
        "value AS record_id",
        f"{exprs['key_json']} AS key_json",
        f"{exprs['value_json']} AS value_json",
        f"{exprs['topic']} AS topic",
        f"{exprs['h_country']} AS h_country",
        f"{exprs['h_animal']} AS h_animal",
    )
    return to_kafka_rows(records)


def kafka_writer(
    records: DataFrame,
    bootstrap_servers: str,
    client_config: dict[str, str] | None = None,
    compression_type: str = "none",
    checkpoint_dir: str = "/tmp/console-datagen-spark/checkpoints/producer",
    trigger_seconds: int = 1,
) -> DataStreamWriter:
    """Kafka sink writer mirroring the reference producer semantics:
    acks=1, per-producer compression codec, headers included
    (DataGenerator.java:370-374, AP:24-26).

    Caller starts it; no broker exists in the test container, so tests
    exercise plan construction and the memory-sink variant only.
    """
    writer = (
        records.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("kafka.acks", "1")
        .option("kafka.compression.type", compression_type)
        .option("includeHeaders", "true")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
    )
    for k, v in kafka_stream_options(client_config or {}).items():
        writer = writer.option(k, v)
    return writer
