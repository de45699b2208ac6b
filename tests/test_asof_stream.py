"""Streaming point-in-time enrichment: parity with the batch as-of query
and cross-micro-batch carry."""

import threading
import time

from console_datagen_spark.plans import all_queries
from console_datagen_spark.streaming.enrich import asof_enrich_stream

SCHEMA = "user_id LONG, event_id LONG, event_type STRING, value DOUBLE, ts TIMESTAMP"
DEADLINE_S = 90


def test_single_batch_parity_with_batch_pit(spark, sf_dir):
    """One micro-batch holding the whole fixture must reproduce the batch
    join_point_in_time result exactly (same in-batch as-of ordering)."""
    from console_datagen_spark.catalog import register_views

    ev = register_views(spark, sf_dir, ("events",))["events"]
    src = ev.select("user_id", "event_id", "event_type", "value", "ts")
    want = {
        (r.user_id, r.event_id): (r.feat_event_id, r.feat_cents)
        for r in all_queries()["join_point_in_time"].spark(spark, sf_dir).collect()
    }

    got = {}

    def grab(batch_df, batch_id):
        for r in batch_df.collect():
            got[(r.user_id, r.event_id)] = (r.feat_event_id, r.feat_cents)

    # drive the stateful op over ONE batch via foreachBatch on a
    # batch-sourced stream substitute: applyInPandasWithState needs a
    # streaming frame, so replay through a memory-less single-batch file
    # stream
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        src.coalesce(1).write.mode("overwrite").parquet(d + "/src")
        stream = spark.readStream.schema(SCHEMA).parquet(d + "/src")
        q = (
            asof_enrich_stream(stream)
            .writeStream.foreachBatch(grab)
            .option("checkpointLocation", d + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(DEADLINE_S)
    assert got == want


def test_cross_batch_carry(spark, tmp_path):
    """A feature update in batch N must enrich a purchase in batch N+1."""
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    emitted, lock = [], threading.Lock()

    def grab(batch_df, batch_id):
        rows = batch_df.collect()
        with lock:
            emitted.extend(rows)

    def write(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    write([(1, 10, "view", 1.23, t0)])  # feature only, no output
    q = (
        asof_enrich_stream(spark.readStream.schema(SCHEMA).parquet(str(src)))
        .writeStream.foreachBatch(grab)
        .option("checkpointLocation", str(ckpt))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + DEADLINE_S
        # wait until batch 1 is consumed (progress advances), then append
        while time.time() < deadline and (
            q.lastProgress is None or q.lastProgress["numInputRows"] == 0
        ):
            time.sleep(0.25)
        write([(1, 20, "purchase", 9.99, t0 + dt.timedelta(hours=1))])
        while time.time() < deadline:
            with lock:
                if emitted:
                    break
            time.sleep(0.25)
    finally:
        q.stop()
    assert emitted, "no enriched purchase emitted"
    r = emitted[0]
    # the carry crossed the batch boundary: purchase 20 reads feature 10
    assert (r.user_id, r.event_id) == (1, 20)
    assert r.feat_event_id == 10
    assert r.feat_cents == 123


def test_multi_chunk_group_ordering(spark, tmp_path):
    """A group split across multiple Arrow chunks must still apply
    features in (ts, side, event_id) order: with maxRecordsPerBatch=1
    every row is its own chunk, so any per-chunk sorting would process
    rows in arbitrary chunk order and mis-enrich."""
    import datetime as dt

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
    try:
        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, 10, "view", 1.00, t0),
            (1, 11, "view", 2.00, t0 + dt.timedelta(hours=1)),
            (1, 12, "purchase", 9.99, t0 + dt.timedelta(hours=2)),
            (1, 13, "view", 3.00, t0 + dt.timedelta(hours=3)),
            (1, 14, "purchase", 9.99, t0 + dt.timedelta(hours=4)),
        ]
        src, ckpt = tmp_path / "src", tmp_path / "ckpt"
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(str(src))
        got = {}

        def grab(batch_df, batch_id):
            for r in batch_df.collect():
                got[r.event_id] = (r.feat_event_id, r.feat_cents)

        q = (
            asof_enrich_stream(
                spark.readStream.schema(SCHEMA).parquet(str(src))
            )
            .writeStream.foreachBatch(grab)
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(90)
        # purchase 12 must read feature 11 (latest <= 02:00), purchase 14
        # must read feature 13 — regardless of Arrow chunk arrival order
        assert got == {12: (11, 200), 14: (13, 300)}
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
