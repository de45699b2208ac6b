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


# ---- r13: interval_join_streams (explicit delays, leftOuter) ----------------

from datetime import timedelta

import pytest

from console_datagen_spark.streaming.stream_join import interval_join_streams

IMP_SCHEMA = "user_id LONG, imp_id LONG, ts TIMESTAMP"
CLK_SCHEMA = "user_id LONG, clk_id LONG, ts TIMESTAMP"
BASE = datetime(2026, 1, 1, 12, 0, 0)


def _rows(spark, schema, seq):
    return spark.createDataFrame(
        [(u, i, BASE + timedelta(seconds=s)) for (u, i, s) in seq],
        schema,
    )


IMPS = [(1, 100, 0), (1, 101, 30), (2, 200, 5), (3, 300, 10)]
CLKS = [
    (1, 900, 4),  # matches imp 100 (within 10 s)
    (1, 901, 33),  # matches imp 101
    (1, 902, 20),  # matches nothing (gap between imps)
    (2, 903, 16),  # outside imp 200's 10 s window
    (4, 904, 7),  # key never impressed
]
# sentinels that push both watermarks far past every event, so outer
# state is provably evictable during the availableNow drain
IMP_SENTINEL = [(99, 999, 500)]
CLK_SENTINEL = [(99, 998, 500)]


def _run_stream_join(spark, tmp_path, join_type):
    imp_dir, clk_dir = tmp_path / "imps", tmp_path / "clks"
    _rows(spark, IMP_SCHEMA, IMPS + IMP_SENTINEL).coalesce(1).write.mode(
        "append"
    ).parquet(str(imp_dir))
    _rows(spark, CLK_SCHEMA, CLKS + CLK_SENTINEL).coalesce(1).write.mode(
        "append"
    ).parquet(str(clk_dir))
    joined = interval_join_streams(
        spark.readStream.schema(IMP_SCHEMA).parquet(str(imp_dir)),
        spark.readStream.schema(CLK_SCHEMA).parquet(str(clk_dir)),
        key="user_id",
        within="10 seconds",
        left_delay="5 seconds",
        right_delay="5 seconds",
        join_type=join_type,
    ).selectExpr("l.user_id AS user_id", "imp_id", "clk_id")
    out = []
    q = (
        joined.writeStream.foreachBatch(lambda df, _id: out.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{join_type}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {(r.user_id, r.imp_id, r.clk_id) for r in out}


def test_inner_join_matches_batch(spark, tmp_path):
    got = _run_stream_join(spark, tmp_path, "inner")
    want = {
        (r.user_id, r.imp_id, r.clk_id)
        for r in interval_join_streams(
            _rows(spark, IMP_SCHEMA, IMPS + IMP_SENTINEL),
            _rows(spark, CLK_SCHEMA, CLKS + CLK_SENTINEL),
            key="user_id",
            within="10 seconds",
            left_delay="5 seconds",
            right_delay="5 seconds",
        )
        .selectExpr("l.user_id AS user_id", "imp_id", "clk_id")
        .collect()
    }
    assert got == want
    assert (1, 100, 900) in got and (1, 101, 901) in got
    assert not any(c == 902 for (_, _, c) in got)  # gap click unmatched
    assert not any(c == 903 for (_, _, c) in got)  # outside the window


def test_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    got = _run_stream_join(spark, tmp_path, "leftOuter")
    # every matched pair from the inner semantics, PLUS the impressions
    # the watermark proved unmatched, null-extended
    assert (2, 200, None) in got
    assert (3, 300, None) in got
    assert (1, 100, 900) in got and (1, 101, 901) in got


def test_explicit_delays_required(spark):
    with pytest.raises(ValueError, match="explicit watermark delays"):
        interval_join_streams(
            _rows(spark, IMP_SCHEMA, IMPS),
            _rows(spark, CLK_SCHEMA, CLKS),
            key="user_id",
            within="10 seconds",
            left_delay="",
            right_delay="5 seconds",
        )


# ---- r14: rightOuter / fullOuter (VERDICT r13 #8) ---------------------------


def _run_stream_join_both_uids(spark, tmp_path, join_type):
    """Like _run_stream_join but keeps BOTH sides' keys: outer rows
    null one side, so the projection must not collapse them."""
    imp_dir, clk_dir = tmp_path / "imps", tmp_path / "clks"
    _rows(spark, IMP_SCHEMA, IMPS + IMP_SENTINEL).coalesce(1).write.mode(
        "append"
    ).parquet(str(imp_dir))
    _rows(spark, CLK_SCHEMA, CLKS + CLK_SENTINEL).coalesce(1).write.mode(
        "append"
    ).parquet(str(clk_dir))
    joined = interval_join_streams(
        spark.readStream.schema(IMP_SCHEMA).parquet(str(imp_dir)),
        spark.readStream.schema(CLK_SCHEMA).parquet(str(clk_dir)),
        key="user_id",
        within="10 seconds",
        left_delay="5 seconds",
        right_delay="5 seconds",
        join_type=join_type,
    ).selectExpr(
        "l.user_id AS l_uid", "r.user_id AS r_uid", "imp_id", "clk_id"
    )
    out = []
    q = (
        joined.writeStream.foreachBatch(lambda df, _id: out.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{join_type}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {(r.l_uid, r.r_uid, r.imp_id, r.clk_id) for r in out}


def test_right_outer_emits_unmatched_clicks(spark, tmp_path):
    got = _run_stream_join_both_uids(spark, tmp_path, "rightOuter")
    # matched pairs are present...
    assert (1, 1, 100, 900) in got and (1, 1, 101, 901) in got
    # ...and every click the watermark proved unmatched null-extends the
    # LEFT side: the gap click, the outside-window click, the
    # never-impressed key
    assert (None, 1, None, 902) in got
    assert (None, 2, None, 903) in got
    assert (None, 4, None, 904) in got
    # unmatched impressions do NOT appear in a right outer join
    assert not any(i == 200 for (_, _, i, _) in got)
    assert not any(i == 300 for (_, _, i, _) in got)


def test_full_outer_emits_both_sides(spark, tmp_path):
    got = _run_stream_join_both_uids(spark, tmp_path, "fullOuter")
    # matched pairs
    assert (1, 1, 100, 900) in got and (1, 1, 101, 901) in got
    # left-unmatched impressions, null-extended right
    assert (2, None, 200, None) in got
    assert (3, None, 300, None) in got
    # right-unmatched clicks, null-extended left
    assert (None, 1, None, 902) in got
    assert (None, 2, None, 903) in got
    assert (None, 4, None, 904) in got


def test_full_outer_is_union_of_one_sided_outers(spark, tmp_path):
    """Null-extension parity: fullOuter == leftOuter ∪ rightOuter on the
    same fixed inputs (their inner cores coincide)."""
    lo = _run_stream_join_both_uids(spark, tmp_path / "lo", "leftOuter")
    ro = _run_stream_join_both_uids(spark, tmp_path / "ro", "rightOuter")
    fo = _run_stream_join_both_uids(spark, tmp_path / "fo", "fullOuter")
    assert fo == lo | ro


def test_unknown_join_type_rejected(spark):
    with pytest.raises(ValueError, match="unsupported join_type"):
        interval_join_streams(
            _rows(spark, IMP_SCHEMA, IMPS),
            _rows(spark, CLK_SCHEMA, CLKS),
            key="user_id",
            within="10 seconds",
            left_delay="5 seconds",
            right_delay="5 seconds",
            join_type="leftSemi",
        )


def test_measure_then_configure_join_zero_drops(spark, tmp_path):
    """The measure->configure loop for the JOIN surface (r13 proved it
    for cdc_compact): DisorderMonitor measures the click stream's actual
    disorder, its suggested delay feeds interval_join_streams'
    right_delay, and the late click still attributes — while a
    '0 seconds' control on the same stream LOSES the match, proving the
    measurement is load-bearing for joins exactly as for compaction."""
    import shutil

    from console_datagen_spark.streaming.disorder import DisorderMonitor

    imp_dir, clk_dir = tmp_path / "imps", tmp_path / "clks"
    # imp sentinel at t=60 advances the LEFT watermark to 55: Spark's
    # global watermark is the MIN across sides, so without it the
    # undelayed control would never consider the late click late
    IMPS_MC = [(1, 100, 0), (2, 200, 5), (97, 970, 60)]
    _rows(spark, IMP_SCHEMA, IMPS_MC).coalesce(1).write.parquet(str(imp_dir))

    # click batches: batch 1 pushes the right frontier to t=60; batch 2
    # opens with a click 51 s BEHIND it (event time 9, matching imp
    # 200's [5,15] window); batch 3 is a far sentinel that drains state
    clk_batches = [
        [(1, 900, 4), (5, 950, 60)],
        [(2, 903, 9)],
        [(98, 980, 500)],
    ]

    def replay_clicks(start, ckpt):
        shutil.rmtree(str(clk_dir), ignore_errors=True)
        for b in clk_batches:
            _rows(spark, CLK_SCHEMA, b).coalesce(1).write.mode(
                "append"
            ).parquet(str(clk_dir))
            q = start(
                spark.readStream.schema(CLK_SCHEMA).parquet(str(clk_dir)),
                ckpt,
            )
            q.awaitTermination(120)

    # ---- measure ----
    mon = DisorderMonitor(ts_col="ts")
    replay_clicks(
        lambda s, ck: s.writeStream.foreachBatch(mon.update)
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start(),
        tmp_path / "mon_ckpt",
    )
    rep = mon.report()
    assert rep["max_late_ms"] == 51_000
    # stream-stream join state predicates are boundary-INCLUSIVE (an
    # event exactly AT the watermark is treated as late), unlike the
    # session-TTL eviction the cdc demo configures — the measured
    # max_late_ms is the infimum, so a join deployer adds one tick:
    delay = f"{rep['max_late_ms'] + 1000} milliseconds"

    # ---- configure ----
    def run_join(right_delay, ckpt):
        out = []

        def start(clicks, ck):
            joined = interval_join_streams(
                spark.readStream.schema(IMP_SCHEMA).parquet(str(imp_dir)),
                clicks,
                key="user_id",
                within="10 seconds",
                left_delay="5 seconds",
                right_delay=right_delay,
            ).selectExpr("l.user_id AS user_id", "imp_id", "clk_id")
            return (
                joined.writeStream.foreachBatch(
                    lambda df, _id: out.extend(df.collect())
                )
                .outputMode("append")
                .option("checkpointLocation", str(ck))
                .trigger(availableNow=True)
                .start()
            )

        replay_clicks(start, ckpt)
        return {(r.user_id, r.imp_id, r.clk_id) for r in out}

    # batch ground truth over the complete data
    truth = {
        (r.user_id, r.imp_id, r.clk_id)
        for r in interval_join_streams(
            _rows(spark, IMP_SCHEMA, IMPS_MC),
            _rows(spark, CLK_SCHEMA, sum(clk_batches, [])),
            key="user_id",
            within="10 seconds",
            left_delay="5 seconds",
            right_delay="5 seconds",
        )
        .selectExpr("l.user_id AS user_id", "imp_id", "clk_id")
        .collect()
    }
    assert (2, 200, 903) in truth  # the late click DOES match in batch

    got = run_join(delay, tmp_path / "join_ckpt")
    assert got == truth  # zero late-drops under the measured delay

    control = run_join("0 seconds", tmp_path / "join_ckpt0")
    assert (2, 200, 903) not in control  # the control provably loses it
    assert (1, 100, 900) in control
