"""Streaming-vs-batch window parity (SURVEY §5.2.3) + watermark late data.

The events fixture is replayed as a file stream (one parquet chunk per
micro-batch); windowed streaming output in complete mode must equal the
batch result over the same rows — that's the engine-side guarantee the
DuckDB oracle can't check directly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from console_datagen_spark.catalog import register_views
from console_datagen_spark.streaming.windows import (
    rate_per_bucket,
    tumbling_counts,
    with_watermark,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return register_views(spark, sf_dir, ("events",))["events"]


@pytest.fixture(scope="module")
def replay_dir(spark, events, tmp_path_factory):
    """Events split into 4 parquet chunks for maxFilesPerTrigger replay."""
    d = tmp_path_factory.mktemp("events_replay")
    events.repartition(4).write.mode("overwrite").parquet(str(d / "data"))
    return str(d / "data")


def replay_stream(spark, replay_dir, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(replay_dir)
    )


def test_tumbling_streaming_equals_batch(spark, events, replay_dir, tmp_path):
    stream = replay_stream(spark, replay_dir, events.schema)
    q = (
        tumbling_counts(stream, "1 hour", ("event_type",))
        .writeStream.format("memory")
        .queryName("win_parity")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.ws, r.event_type): r.n
        for r in spark.sql("SELECT * FROM win_parity").collect()
    }
    want = {
        (r.ws, r.event_type): r.n
        for r in tumbling_counts(events, "1 hour", ("event_type",)).collect()
    }
    assert got == want
    assert len(want) > 0


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode with watermark: a window only emits once the watermark
    passes its end; data later than the watermark is dropped.

    Two availableNow runs share one checkpoint so the watermark advanced by
    run 1 (03:00 − 1h = 02:00) is durable before the late file appears —
    exactly how a restarted production stream sees late data.
    """
    src_dir = tmp_path / "late_src"
    ckpt = str(tmp_path / "late_ckpt")
    schema = "ts STRING, k STRING"

    def write_chunk(rows, name):
        (
            spark.createDataFrame(rows, schema)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .coalesce(1)
            .write.mode("append")
            .parquet(str(src_dir))
        )

    def run_once(sink_name):
        # memory sink can't recover from a checkpoint; foreachBatch can
        emitted: list = []

        def grab(batch_df, batch_id):
            emitted.extend(batch_df.collect())

        stream = spark.readStream.schema("ts TIMESTAMP, k STRING").parquet(
            str(src_dir)
        )
        windowed = (
            with_watermark(stream, "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("win"), "k")
            .agg(F.count("*").alias("n"))
        )
        q = (
            windowed.writeStream.foreachBatch(grab)
            .queryName(sink_name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {(r.win.start.isoformat(), r.k): r.n for r in emitted}

    # run 1: two on-time events in [00:00,01:00) + a watermark driver at 03:00
    write_chunk(
        [("2024-01-01 00:10:00", "a"), ("2024-01-01 00:20:00", "a"),
         ("2024-01-01 03:00:00", "b")],
        "b1",
    )
    out1 = run_once("late_run_1")
    # run 2: one late event back in the already-closed window
    write_chunk([("2024-01-01 00:30:00", "a")], "b2")
    out2 = run_once("late_run_2")

    # run 1 closed [00:00,01:00) with its 2 on-time events once the 03:00
    # event pushed the watermark to 02:00
    assert out1.get(("2024-01-01T00:00:00", "a")) == 2
    # run 2's late 00:30 event (behind the restored watermark) was dropped —
    # the closed window is not re-emitted or corrected
    assert ("2024-01-01T00:00:00", "a") not in out2


def test_session_window_late_data_parity(spark, tmp_path):
    """Session windows + watermark, out-of-order replay: the streaming
    output must equal the batch session result over the ON-TIME subset, and
    a late event behind the restored watermark is dropped — it neither
    reopens nor corrects the already-emitted session (VERDICT r1 item 8).
    """
    from console_datagen_spark.streaming.windows import session_counts

    src_dir = tmp_path / "sess_src"
    ckpt = str(tmp_path / "sess_ckpt")

    def write_chunk(rows):
        (
            spark.createDataFrame(rows, "ts STRING, k STRING")
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .coalesce(1)
            .write.mode("append")
            .parquet(str(src_dir))
        )

    def run_once():
        emitted: list = []

        def grab(batch_df, batch_id):
            emitted.extend(batch_df.collect())

        stream = spark.readStream.schema("ts TIMESTAMP, k STRING").parquet(
            str(src_dir)
        )
        q = (
            session_counts(stream, gap="30 minutes", key="k", watermark="1 hour")
            .writeStream.foreachBatch(grab)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {(r.k, r.ss.isoformat(), r.n) for r in emitted}

    # run 1 (out-of-order within the batch): a 2-event session for "a"
    # ([00:00, 00:40) with 30 min gap) + a watermark driver at 03:00
    write_chunk(
        [("2024-01-01 00:10:00", "a"), ("2024-01-01 00:00:00", "a"),
         ("2024-01-01 03:00:00", "b")]
    )
    out1 = run_once()
    # watermark 03:00-1h=02:00 passed the session end → "a" session emitted;
    # "b"'s session (ends 03:30) is still open, not emitted
    assert out1 == {("a", "2024-01-01T00:00:00", 2)}

    # batch parity on the on-time subset
    on_time = spark.createDataFrame(
        [("2024-01-01 00:10:00", "a"), ("2024-01-01 00:00:00", "a")],
        "ts STRING, k STRING",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batch = {
        (r.k, r.ss.isoformat(), r.n)
        for r in session_counts(on_time, gap="30 minutes", key="k").collect()
    }
    assert batch == out1

    # run 2: a late event inside the closed session, behind the restored
    # watermark → dropped; nothing new is emitted
    write_chunk([("2024-01-01 00:05:00", "a")])
    out2 = run_once()
    assert out2 == set()


def test_rate_per_bucket_shape(spark):
    """Sawtooth observable: per-10s buckets over a synthetic generated
    minute must show the {10,110,210,310,410} plateau shape."""
    from console_datagen_spark.functions.rate import RATE_PEAK, RATE_VALUES
    from console_datagen_spark.streaming.generator_stream import sawtooth_thin

    base_ms = 1_704_067_200_000
    ticks = spark.range(RATE_PEAK * 50).select(
        F.timestamp_millis(
            F.lit(base_ms) + (F.col("id") / RATE_PEAK).cast("long") * 1000
        ).alias("ts"),
        F.col("id").alias("value"),
    )
    produced = sawtooth_thin(ticks.withColumnRenamed("ts", "timestamp")).select(
        F.col("timestamp").alias("ts")
    )
    buckets = rate_per_bucket(produced, 10).collect()
    # each 10 s bucket holds 10x one plateau value
    assert sorted(r.n for r in buckets) == sorted(v * 10 for v in RATE_VALUES)


def test_cdc_latest_wins_streaming_equals_batch(
    spark, events, replay_dir, sf_dir, tmp_path
):
    """The latest-wins compaction (cdc_latest_state's semantics) run as a
    streaming aggregation over the replayed fixture equals the batch
    result AND the registered batch query — one definition, two modes."""
    from console_datagen_spark.plans import all_queries
    from console_datagen_spark.streaming.cdc import latest_wins

    stream = replay_stream(spark, replay_dir, events.schema)
    q = (
        latest_wins(stream)
        .writeStream.format("memory")
        .queryName("cdc_parity")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.user_id: (r.last_event_id, r.last_type, r.last_value, r.n_versions)
        for r in spark.sql("SELECT * FROM cdc_parity").collect()
    }
    want = {
        r.user_id: (r.last_event_id, r.last_type, r.last_value, r.n_versions)
        for r in latest_wins(events).collect()
    }
    assert got == want and len(want) > 0
    # ...and both agree with the registered windowed batch query over the
    # same fixture dir
    reg = {
        r.user_id: (r.last_event_id, r.last_type, r.last_value, r.n_versions)
        for r in all_queries()["cdc_latest_state"].spark(spark, sf_dir).collect()
    }
    assert reg == want
