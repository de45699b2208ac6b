"""UDTF burst expansion + partitioned segment sink."""

from pyspark.sql import functions as F

from console_datagen_spark.functions.rate import RATE_VALUES, rate_for_millis_py
from console_datagen_spark.sources.burst_udtf import expand_ticks
from console_datagen_spark.sources.generator import generate_batch, to_kafka_rows
from console_datagen_spark.streaming.file_sink import (
    parquet_segment_writer,
    segment_columns,
)


def test_udtf_burst_counts(spark):
    base = 1_704_067_200_000
    ticks = spark.range(50).select((F.lit(base) + F.col("id") * 1000).alias("tick_ms"))
    out = expand_ticks(spark, ticks)
    per_tick = {r.tick_ms: r.n for r in out.groupBy("tick_ms").agg(
        F.count("*").alias("n")).collect()}
    assert len(per_tick) == 50
    for tick_ms, n in per_tick.items():
        assert n == rate_for_millis_py(tick_ms)
    assert sorted(set(per_tick.values())) == sorted(RATE_VALUES)


def test_udtf_record_ids_unique(spark):
    base = 1_704_067_200_000
    ticks = spark.range(20).select((F.lit(base) + F.col("id") * 1000).alias("tick_ms"))
    out = expand_ticks(spark, ticks)
    assert out.count() == out.select("record_id").distinct().count()


def test_segment_sink_layout(spark, tmp_path):
    records = to_kafka_rows(generate_batch(spark, 90))
    stream_dir = tmp_path / "in"
    records.write.mode("overwrite").parquet(str(stream_dir))
    stream = spark.readStream.schema(records.schema).parquet(str(stream_dir))
    q = (
        parquet_segment_writer(
            stream,
            path=str(tmp_path / "segments"),
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = spark.read.parquet(str(tmp_path / "segments"))
    assert out.count() == 90
    # partition columns materialized in the directory layout
    assert set(out.columns) >= {"key", "value", "topic", "seg_start"}
    assert out.select("topic").distinct().count() == 3
    seg_dirs = list((tmp_path / "segments").glob("topic=*/seg_start=*"))
    assert seg_dirs, "expected topic=/seg_start= partition directories"
