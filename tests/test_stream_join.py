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


def test_late_right_row_beyond_watermark_is_excluded(spark, tmp_path):
    """Checkpoint replay with out-of-order data: a right-side row arriving
    after the watermark has advanced past its event time must be dropped,
    even though the same row WOULD have matched had it arrived on time."""
    ldir, rdir, ckpt = tmp_path / "l", tmp_path / "r", tmp_path / "ck"

    # batch 1: one matchable click, its on-time buy, and a far-future pair
    # that drags the watermark to 10:00 - 2h = 08:00
    spark.createDataFrame(
        [(1, _t(1, 0)), (9, _t(10, 0))], CLICK_SCHEMA
    ).coalesce(1).write.parquet(str(ldir))
    spark.createDataFrame(
        [(1, _t(1, 30)), (9, _t(10, 0))], BUY_SCHEMA
    ).coalesce(1).write.parquet(str(rdir))

    out = tmp_path / "out"

    def run_once():
        # file sink (not memory): it supports restart from the checkpoint,
        # which is the whole point of this test
        q = (
            interval_join(
                spark.readStream.schema(CLICK_SCHEMA).parquet(str(ldir)),
                spark.readStream.schema(BUY_SCHEMA).parquet(str(rdir)),
            )
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r.user_id, r.l_ts, r.r_ts)
            for r in spark.read.parquet(str(out)).collect()
        }

    first = run_once()
    assert (1, _t(1, 0), _t(1, 30)) in first

    # batch 2 (after restart from the same checkpoint): a buy for the SAME
    # click at 01:40 — inside the 1h interval, but its event time is far
    # behind the committed 08:00 watermark, so the state store has already
    # evicted the click and the row itself is late: no new match may appear
    spark.createDataFrame([(1, _t(1, 40))], BUY_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(rdir))
    second = run_once()
    assert (1, _t(1, 0), _t(1, 40)) not in second
    assert second == first
