"""applyInPandasWithState counter: state persistence + threshold crossings."""

import pytest
from pyspark.sql import functions as F

from console_datagen_spark.streaming.stateful import stateful_counts


def _run(spark, src_dir, ckpt):
    emitted = []

    def grab(batch_df, batch_id):
        emitted.extend((batch_id, r) for r in batch_df.collect())

    stream = spark.readStream.schema("topic STRING, partition INT").parquet(
        str(src_dir)
    )
    q = (
        stateful_counts(stream)
        .writeStream.foreachBatch(grab)
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return emitted


def _write(spark, src_dir, rows):
    spark.createDataFrame(rows, "topic STRING, partition INT").coalesce(
        1
    ).write.mode("append").parquet(str(src_dir))


def test_counts_accumulate_across_restarts(spark, tmp_path):
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    _write(spark, src, [("t1", 0)] * 3000 + [("t1", 1)] * 100)
    out1 = {
        (r.topic, r.partition): r for _, r in _run(spark, src, ckpt)
    }
    assert out1[("t1", 0)]["count"] == 3000
    assert out1[("t1", 0)].thresholds_crossed == 0  # below 5000

    # second run continues from checkpointed state: 3000 + 2500 = 5500
    _write(spark, src, [("t1", 0)] * 2500)
    out2 = {
        (r.topic, r.partition): r for _, r in _run(spark, src, ckpt)
    }
    r = out2[("t1", 0)]
    assert r["count"] == 5500
    assert r.delta == 2500
    assert r.thresholds_crossed == 1  # crossed the 5000 boundary exactly once


def test_multiple_threshold_crossings_one_batch(spark, tmp_path):
    src, ckpt = tmp_path / "src2", tmp_path / "ckpt2"
    _write(spark, src, [("t2", 0)] * 12_000)
    out = {
        (r.topic, r.partition): r for _, r in _run(spark, src, ckpt)
    }
    r = out[("t2", 0)]
    assert r["count"] == 12_000
    assert r.thresholds_crossed == 2  # 5000 and 10000


def test_keys_isolated(spark, tmp_path):
    src, ckpt = tmp_path / "src3", tmp_path / "ckpt3"
    _write(spark, src, [("a", 0)] * 10 + [("a", 1)] * 20 + [("b", 0)] * 30)
    out = {
        (r.topic, r.partition): r["count"] for _, r in _run(spark, src, ckpt)
    }
    assert out == {("a", 0): 10, ("a", 1): 20, ("b", 0): 30}


def _run_tws(spark, src_dir, ckpt):
    # transformWithState's Python state-server protocol speaks protobuf;
    # the container has no protobuf wheel, so this runs only where the
    # dependency exists (same honest-gap policy as the Kafka connector jar)
    pytest.importorskip("google.protobuf")
    from console_datagen_spark.streaming.stateful import stateful_counts_tws

    emitted = []

    def grab(batch_df, batch_id):
        emitted.extend((batch_id, r) for r in batch_df.collect())

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema("topic STRING, partition INT").parquet(
            str(src_dir)
        )
        q = (
            stateful_counts_tws(stream)
            .writeStream.foreachBatch(grab)
            .outputMode("update")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    return emitted


def test_tws_counter_matches_applyinpandas_semantics(spark, tmp_path):
    """transformWithState spelling: same counts, deltas and crossings,
    state durable across a checkpointed restart."""
    src, ckpt = tmp_path / "src3", tmp_path / "ckpt3"
    _write(spark, src, [("t3", 0)] * 6000 + [("t3", 1)] * 10)
    out1 = {(r.topic, r.partition): r for _, r in _run_tws(spark, src, ckpt)}
    assert out1[("t3", 0)]["count"] == 6000
    assert out1[("t3", 0)].thresholds_crossed == 1
    assert out1[("t3", 1)]["count"] == 10

    _write(spark, src, [("t3", 0)] * 4500)
    out2 = {(r.topic, r.partition): r for _, r in _run_tws(spark, src, ckpt)}
    r = out2[("t3", 0)]
    assert r["count"] == 10500
    assert r.delta == 4500
    assert r.thresholds_crossed == 1  # 6000 -> 10500 crosses 10000 once
