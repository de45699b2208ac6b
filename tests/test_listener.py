"""StreamingQueryListener health board (S9 surface)."""

import time

from pyspark.sql import functions as F

from console_datagen_spark.streaming.listener import install_health_listener


def test_health_board_tracks_query_lifecycle(spark, tmp_path):
    board, listener = install_health_listener(spark)
    try:
        src = tmp_path / "src"
        spark.range(100).select(
            F.col("id"), F.lit("x").alias("v")
        ).coalesce(1).write.parquet(str(src))
        stream = spark.readStream.schema("id LONG, v STRING").parquet(str(src))
        q = (
            stream.writeStream.format("noop")
            .queryName("health_probe")
            .option("checkpointLocation", str(tmp_path / "c"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        # listener events are async; give the bus a moment
        deadline = time.time() + 20
        while time.time() < deadline:
            snap = board.snapshot()
            done = [
                h for h in snap.values() if not h.active and h.rows_seen >= 100
            ]
            if done:
                break
            time.sleep(0.5)
        snap = board.snapshot()
        assert snap, "listener saw no queries"
        h = next(h for h in snap.values() if h.name == "health_probe")
        assert h.rows_seen == 100
        assert h.batches_seen >= 1
        assert not h.active  # terminated cleanly
        assert h.error is None
        s = board.summary()
        assert s["total_rows"] >= 100
    finally:
        spark.streams.removeListener(listener)
