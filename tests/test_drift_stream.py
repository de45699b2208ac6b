"""Streaming drift monitor: batch-definition parity and alerting."""

from pyspark.sql import functions as F

from console_datagen_spark.catalog import register_views
from console_datagen_spark.streaming.drift import (
    drift_against,
    drift_monitor,
    histogram_permille,
)

SCHEMA = "event_id LONG, value DOUBLE"


def test_self_drift_is_zero(spark, sf_dir):
    ev = register_views(spark, sf_dir, ("events",))["events"]
    h = histogram_permille(ev)
    row = drift_against(h, h).collect()[0]
    assert row.l2_drift == 0
    assert row.max_bin_gap_permille == 0


def test_histogram_matches_batch_drift_definition(spark, sf_dir):
    """The monitor's histogram + distance over the train/val hash-splits
    must reproduce the registered dq_split_drift numbers exactly."""
    from console_datagen_spark.plans import all_queries

    ev = register_views(spark, sf_dir, ("events",))["events"]
    bucket = F.expr(
        "CAST(conv(substr(md5(concat('v1:', CAST(event_id AS STRING))),1,15)"
        ",16,10) AS BIGINT) % 1000"
    )
    train = ev.where(bucket < 800)
    val = ev.where(bucket >= 800)
    got = drift_against(
        histogram_permille(train), histogram_permille(val)
    ).collect()[0]
    want = all_queries()["dq_split_drift"].spark(spark, sf_dir).collect()[0]
    # dq_split_drift reports train-vs-val; drift_against(train_hist,
    # val_hist) is the same comparison (symmetric metrics)
    assert got.l2_drift == want.l2_drift
    assert got.max_bin_gap_permille == want.max_bin_gap_permille


def test_streaming_alert_fires_on_shift(spark, tmp_path):
    baseline = spark.createDataFrame(
        [(i, float(i % 10)) for i in range(200)], SCHEMA
    )
    alerts = []

    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    # batch 0: same distribution as baseline -> no alert;
    # the shifted batch concentrates all mass in the top bin -> alert
    spark.createDataFrame(
        [(i, float(i % 10)) for i in range(200)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(src))
    spark.createDataFrame(
        [(1000 + i, 990.0) for i in range(200)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(src))

    q = (
        drift_monitor(
            spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1)
            .parquet(str(src)),
            baseline,
            on_alert=lambda bid, l2, gap: alerts.append((bid, l2, gap)),
        )
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(90)
    assert len(alerts) == 1, alerts
    _, l2, gap = alerts[0]
    assert gap >= 150 and l2 > 0
