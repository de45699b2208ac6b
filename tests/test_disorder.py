"""Disorder gauge: the measurement tool behind the required
``watermark_delay`` argument (r11 verdict #8).

Seeds a stream with KNOWN out-of-orderness and asserts both spellings
recover it exactly: the batch window gauge over an arrival-order
column, and the foreachBatch monitor measuring lateness against the
prior-batch frontier (the watermark's own rule, at its own batch
granularity)."""

import datetime

from console_datagen_spark.streaming.disorder import (
    DisorderMonitor,
    measure_disorder,
)

SCHEMA = "user_id LONG, event_id LONG, ts TIMESTAMP"
BASE = datetime.datetime(2026, 1, 1, 12, 0, 0)


def _rows(spark, seq):
    """seq = (event_id, seconds-offset); arrival order = event_id."""
    return spark.createDataFrame(
        [(1, e, BASE + datetime.timedelta(seconds=s)) for (e, s) in seq],
        SCHEMA,
    )


def test_measure_disorder_batch_exact(spark):
    # arrival order 0..5; event times regress by a known worst case:
    # event 3 arrives 8 s behind the running max (11), event 5 is 2 s
    # behind (12 vs 14) — max lateness 8000 ms, 2 of 6 late
    seq = [(0, 0), (1, 10), (2, 11), (3, 3), (4, 14), (5, 12)]
    row = measure_disorder(
        _rows(spark, seq), ts_col="ts", arrival_col="event_id"
    ).collect()[0]
    assert row["n_events"] == 6
    assert row["n_late"] == 2
    assert row["max_late_ms"] == 8_000
    assert row["p999_late_ms"] == 8_000  # top quantile sees the max
    assert row["p5_late_ms"] == 0  # median event is in order

    # an in-order stream measures zero everywhere: '0 seconds' is safe
    ordered = [(i, i) for i in range(5)]
    row = measure_disorder(_rows(spark, ordered)).collect()[0]
    assert (row["n_late"], row["max_late_ms"]) == (0, 0)


def test_measure_disorder_partitioned(spark):
    # two interleaved ordered shards look disordered globally but clean
    # per partition — partition_cols gives the sharper per-shard bound
    import datetime as dt

    rows = [
        (p, i, BASE + dt.timedelta(seconds=10 * i + p * 5))
        for i in range(4)
        for p in (0, 1)
    ]
    df = spark.createDataFrame(rows, "part LONG, event_id LONG, ts TIMESTAMP")
    per_shard = measure_disorder(
        df, arrival_col="event_id", partition_cols=("part",)
    ).collect()[0]
    assert per_shard["max_late_ms"] == 0  # each shard is ordered


def test_disorder_monitor_stream_matches_seeded_bound(spark, tmp_path):
    """foreachBatch monitor over a parquet stream: lateness is vs the
    PRIOR batches' max event time (the watermark rule), so the seeded
    cross-batch regression is recovered exactly and intra-batch
    disorder is ignored — report() then hands back the zero-loss
    delay ready to pass as watermark_delay."""
    src = tmp_path / "src"
    mon = DisorderMonitor(ts_col="ts")

    def run_once():
        q = (
            spark.readStream.schema(SCHEMA)
            .parquet(str(src))
            .writeStream.foreachBatch(mon.update)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: frontier ends at 100 s; intra-batch regression (40) must
    # NOT count — the watermark never saw a frontier before this batch
    _rows(spark, [(0, 100), (1, 40)]).coalesce(1).write.mode("append").parquet(
        str(src)
    )
    run_once()
    # batch 2: 97 s is 3 s behind the frontier (100) — the seeded bound
    _rows(spark, [(2, 97), (3, 105)]).coalesce(1).write.mode("append").parquet(
        str(src)
    )
    run_once()
    # batch 3: in order vs frontier 105
    _rows(spark, [(4, 106)]).coalesce(1).write.mode("append").parquet(str(src))
    run_once()

    rep = mon.report()
    assert rep["n_events"] == 5
    assert rep["n_late"] == 1
    assert rep["max_late_ms"] == 3_000
    assert rep["suggested_watermark_delay"] == "3000 milliseconds"
    # and the suggestion is in the exact form latest_wins_ttl_jvm takes
    from console_datagen_spark.streaming.cdc import latest_wins_ttl_jvm

    out = latest_wins_ttl_jvm(
        spark.readStream.schema(SCHEMA).parquet(str(src)).withColumn(
            "event_type", _lit_type()
        ).withColumn("value", _lit_val()),
        watermark_delay=rep["suggested_watermark_delay"],
    )
    assert out.isStreaming


def _lit_type():
    from pyspark.sql import functions as F

    return F.lit("view")


def _lit_val():
    from pyspark.sql import functions as F

    return F.lit(1.0)


def test_measure_then_configure_cdc_zero_drops(spark, tmp_path):
    """The full measure->configure loop a deployer runs (r12 verdict #8):
    measure a seeded out-of-order stream with DisorderMonitor, feed
    report()['suggested_watermark_delay'] into cdc_compact, and assert
    the late event was NOT dropped — every evicted snapshot matches the
    batch latest_wins ground truth over the complete data. A control run
    with watermark_delay='0 seconds' on the same stream LOSES the late
    event (its session end is behind the undelayed watermark), proving
    the measurement is load-bearing, not ceremony."""
    from console_datagen_spark.streaming.cdc import cdc_compact, latest_wins

    SCHEMA_TS = (
        "user_id LONG, event_id LONG, event_type STRING, value DOUBLE, "
        "ts TIMESTAMP"
    )

    def ts_rows(rows):
        base = datetime.datetime(2026, 1, 1, 12, 0, 0)
        return spark.createDataFrame(
            [
                (u, e, t, v, base + datetime.timedelta(seconds=s))
                for (u, e, t, v, s) in rows
            ],
            SCHEMA_TS,
        )

    # batch 1 ends with the frontier at 25 s (user 3); batch 2 opens with
    # user 1's final version arriving 17 s BEHIND that frontier. With
    # ttl (session gap) = 10 s its session end (8 + 10 = 18) is behind
    # the undelayed watermark (25), so '0 seconds' drops it; the
    # measured 17 s delay holds the watermark at 8 and keeps it.
    ttl_ms = 10_000
    batches = [
        [(1, 10, "view", 1.0, 0), (1, 11, "click", 2.0, 5),
         (3, 30, "view", 4.0, 25)],
        [(1, 12, "purchase", 9.0, 8), (2, 20, "view", 5.0, 26)],
        # sentinel far past every session end + TTL: closes all sessions
        [(99, 990, "view", 0.0, 200)],
    ]

    src = tmp_path / "cdc_src"

    def replay(update, ckpt):
        """Append one batch at a time and drain the query after each —
        deterministic batch boundaries (file-listing order is not)."""
        import shutil

        shutil.rmtree(str(src), ignore_errors=True)
        for b in batches:
            ts_rows(b).coalesce(1).write.mode("append").parquet(str(src))
            q = update(
                spark.readStream.schema(SCHEMA_TS).parquet(str(src)), ckpt
            )
            q.awaitTermination(120)

    # ---- measure: the monitor rides the same source ----
    mon = DisorderMonitor(ts_col="ts")

    def start_mon(stream, ckpt):
        return (
            stream.writeStream.foreachBatch(mon.update)
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )

    replay(start_mon, tmp_path / "mon_ckpt")
    rep = mon.report()
    assert rep["max_late_ms"] == 17_000  # the seeded cross-batch regression
    delay = rep["suggested_watermark_delay"]

    # ---- configure: the measured delay keeps every late event ----
    def run_cdc(watermark_delay, ckpt):
        emitted = []

        def start(stream, ckpt_dir):
            return (
                cdc_compact(stream, ttl_ms=ttl_ms,
                            watermark_delay=watermark_delay)
                .writeStream.foreachBatch(
                    lambda df, _id: emitted.extend(df.collect())
                )
                .outputMode("append")
                .option("checkpointLocation", str(ckpt_dir))
                .trigger(availableNow=True)
                .start()
            )

        replay(start, ckpt)
        return {r.user_id: r for r in emitted}

    got = run_cdc(delay, tmp_path / "cdc_ckpt")
    truth = {
        r.user_id: r
        for r in latest_wins(ts_rows(batches[0] + batches[1])).collect()
    }
    # zero late-drops: user 1's evicted snapshot includes the late
    # purchase (its session's true latest version); users 2/3 intact
    for uid in (1, 2, 3):
        assert (
            got[uid].last_event_id,
            got[uid].last_type,
            got[uid].last_value,
            got[uid].n_versions,
        ) == (
            truth[uid].last_event_id,
            truth[uid].last_type,
            truth[uid].last_value,
            truth[uid].n_versions,
        ), got[uid]

    # ---- control: an unmeasured '0 seconds' guess LOSES the event ----
    lossy = run_cdc("0 seconds", tmp_path / "cdc_ckpt0")
    assert lossy[1].last_event_id == 11  # the late purchase was dropped
    assert lossy[1].n_versions == 2
