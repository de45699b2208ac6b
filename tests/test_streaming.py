"""Streaming surface tests: sawtooth generator stream, counters, health.

No Kafka broker exists in the container, so the Kafka sink is exercised at
plan-construction level; data-path tests run through rate-micro-batch +
memory/foreachBatch sinks (SURVEY §5.2.3).
"""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from console_datagen_spark.functions.rate import RATE_PEAK, RATE_VALUES
from console_datagen_spark.streaming import counters as CT
from console_datagen_spark.streaming import health as H
from console_datagen_spark.streaming.generator_stream import (
    kafka_writer,
    records_stream,
    sawtooth_thin,
)


def test_sawtooth_thin_batch_equivalence(spark):
    """Apply the thinning predicate to a synthetic batch of ticks: each
    1-second tick must keep exactly rate(tick) rows."""
    base_ms = 1_704_067_200_000
    ticks = spark.range(RATE_PEAK * 50).select(
        F.timestamp_millis(
            F.lit(base_ms) + (F.col("id") / RATE_PEAK).cast("long") * 1000
        ).alias("timestamp"),
        F.col("id").alias("value"),
    )
    kept = (
        sawtooth_thin(ticks)
        .groupBy("timestamp")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    per_tick = sorted({r.n for r in kept})
    assert per_tick == sorted(RATE_VALUES)
    total = sum(r.n for r in kept)
    assert total == sum(RATE_VALUES) * 10  # 50 ticks = 10 full plateaus


def test_records_stream_plan_and_memory_sink(spark, tmp_path):
    """Drive one micro-batch of the streaming generator into a memory sink."""
    rec = records_stream(spark, micro_batch=True, num_partitions=2)
    assert rec.isStreaming
    q = (
        rec.writeStream.format("memory")
        .queryName("gen_test_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = spark.sql("SELECT * FROM gen_test_sink")
    n = out.count()
    assert n > 0
    row = out.first()
    assert row.topic.startswith("console_datagen_000-")
    assert [h.key for h in row.headers] == ["X-Country", "X-Animal"]
    assert bytes(row.key).startswith(b'{"storeId"')


def test_kafka_writer_builds(spark):
    """Sink plan construction only (no broker in the container)."""
    rec = records_stream(spark, micro_batch=True)
    writer = kafka_writer(rec, "localhost:9092", compression_type="gzip")
    assert writer is not None


def test_init_counters_cross_product(spark):
    init = CT.init_counters(spark, "c1", ["t1", "t2"], 3)
    rows = init.collect()
    assert len(rows) == 6
    assert all(r["count"] == 0 for r in rows)
    assert {(r.topic, r.partition) for r in rows} == {
        (t, p) for t in ("t1", "t2") for p in range(3)
    }


def test_count_and_merge(spark):
    init = CT.init_counters(spark, "c1", ["t1", "t2"], 2)
    envelopes = spark.createDataFrame(
        [("t1", 0)] * 5 + [("t1", 1)] * 3 + [("t2", 0)] * 2,
        "topic STRING, partition INT",
    )
    merged = CT.merge_counts(init, CT.count_records(envelopes, "c1"))
    out = {(r.topic, r.partition): r["count"] for r in merged.collect()}
    assert out == {("t1", 0): 5, ("t1", 1): 3, ("t2", 0): 2, ("t2", 1): 0}


def test_truncation_predicate(spark):
    offsets = spark.createDataFrame(
        [("t1", 0, o) for o in range(0, 6000, 100)]  # depth 5900 ≥ 5000
        + [("t1", 1, o) for o in range(0, 100, 10)],  # depth 90 < 5000
        "topic STRING, partition INT, offset LONG",
    )
    need = CT.partitions_needing_truncation(offsets, 5000).collect()
    assert len(need) == 1
    # cut = max record offset + 1: the listOffsets END offset, so the
    # delete retains nothing (delete_records(before=endOffset) parity)
    assert (need[0].topic, need[0].partition, need[0].truncate_before) == (
        "t1", 0, 5901,
    )


def _mm(topic, partition, earliest, latest):
    return {
        "topic": topic,
        "partition": partition,
        "earliest": earliest,
        "latest": latest,
    }


def test_truncation_gate_accumulates_across_batches():
    """Depth grows by small batches (each < max) and the gate still fires —
    exactly once — when the cumulative depth crosses the threshold
    (reference consults broker listOffsets, DataGenerator.java:553-575)."""
    gate = CT.TruncationGate(max_topic_depth=5000)
    # three batches of 2000 records each on (t1, 0): 0-1999, 2000-3999, 4000-5999
    assert gate.observe([_mm("t1", 0, 0, 1999)]) == []
    assert gate.observe([_mm("t1", 0, 2000, 3999)]) == []
    need = gate.observe([_mm("t1", 0, 4000, 5999)])
    # cut = end offset (5999 + 1): records 0-5999 are all deleted
    assert need == [{"topic": "t1", "partition": 0, "truncate_before": 6000}]
    # earliest advanced to the cut: a replayed/next small batch must NOT re-fire
    assert gate.observe([_mm("t1", 0, 6000, 6099)]) == []
    # ...until a further full depth accumulates past the cut
    assert gate.observe([_mm("t1", 0, 6100, 11000)]) == [
        {"topic": "t1", "partition": 0, "truncate_before": 11001}
    ]


def test_truncation_gate_per_partition_isolation():
    gate = CT.TruncationGate(max_topic_depth=100)
    need = gate.observe(
        [_mm("t1", 0, 0, 250), _mm("t1", 1, 0, 50), _mm("t2", 0, 0, 99)]
    )
    # (t2, 0) holds EXACTLY max_topic_depth records (offsets 0-99): the
    # end-offset depth fires at the boundary, as the reference's
    # latest - earliest >= maxTopicDepth does
    assert need == [
        {"topic": "t1", "partition": 0, "truncate_before": 251},
        {"topic": "t2", "partition": 0, "truncate_before": 100},
    ]


def test_truncation_gate_broker_seed_after_restart():
    """A restarted gate re-seeds earliest from broker beginning_offsets, so
    pre-restart depth isn't forgotten: first batch after restart sees
    offsets 4000-4500 but the broker log-start is still 0."""
    probed = []

    def broker_offsets(keys):
        probed.extend(keys)
        return {k: 0 for k in keys}

    gate = CT.TruncationGate(max_topic_depth=5000, broker_offsets=broker_offsets)
    need = gate.observe([_mm("t1", 0, 4000, 5200)])
    assert probed == [("t1", 0)]
    assert need == [{"topic": "t1", "partition": 0, "truncate_before": 5201}]
    # probe happens once per partition, not per batch
    assert gate.observe([_mm("t1", 0, 5300, 5400)]) == []
    assert probed == [("t1", 0)]


@pytest.fixture()
def now():
    return datetime(2024, 1, 1, 12, 0, 0)


def test_activity_updates_on_progress(spark, now):
    startup = now - timedelta(minutes=30)
    prev = spark.createDataFrame(
        [("c", "t", 0, 10), ("c", "t", 1, 10)],
        "cluster STRING, topic STRING, partition INT, count LONG",
    )
    cur = spark.createDataFrame(
        [("c", "t", 0, 15), ("c", "t", 1, 10)],
        "cluster STRING, topic STRING, partition INT, count LONG",
    )
    act = H.activity_from_snapshots(prev, cur, None, now, startup)
    rows = {r.partition: r for r in act.collect()}
    assert rows[0].last_update == now  # progressed → stamped now
    assert rows[1].last_update == startup  # stalled → default (J3)
    assert rows[0]["count"] == 15


def test_health_summary_up_down(spark, now):
    fresh = now - timedelta(minutes=1)
    stale = now - timedelta(minutes=10)
    act = spark.createDataFrame(
        [("c", "t", 0, 100, fresh), ("c", "t", 1, 50, stale)],
        "cluster STRING, topic STRING, partition INT, count LONG, last_update TIMESTAMP",
    )
    row = H.health_summary(act, now).first()
    assert row.current_count == 150
    assert row.inactive_partitions == 1
    assert row.status == "DOWN"
    assert row.earliest_activity == stale and row.latest_activity == fresh

    all_fresh = act.withColumn("last_update", F.lit(fresh))
    row2 = H.health_summary(all_fresh, now).first()
    assert row2.status == "UP" and row2.inactive_partitions == 0


def test_staleness_tiers(spark, now):
    act = spark.createDataFrame(
        [(now - timedelta(minutes=m),) for m in (0, 3, 4, 6)],
        "last_update TIMESTAMP",
    )
    tiers = [r[0] for r in act.select(H.staleness_tier(now)).collect()]
    assert tiers == ["OK", "DEBUG", "INFO", "WARN"]


def test_activity_chain_across_rounds(spark, now):
    """Three snapshot rounds: last_update must carry forward through the
    prev_activity table exactly like the reference's saved snapshots
    (CounterProgressCheck.java:124-129)."""
    startup = now - timedelta(minutes=60)
    t1, t2 = now + timedelta(minutes=5), now + timedelta(minutes=10)
    schema = "cluster STRING, topic STRING, partition INT, count LONG"
    snap0 = spark.createDataFrame([("c", "t", 0, 0), ("c", "t", 1, 0)], schema)
    snap1 = spark.createDataFrame([("c", "t", 0, 5), ("c", "t", 1, 0)], schema)
    snap2 = spark.createDataFrame([("c", "t", 0, 5), ("c", "t", 1, 3)], schema)

    act1 = H.activity_from_snapshots(snap0, snap1, None, now, startup)
    # round 2: partition 0 stalls (keeps round-1 stamp), partition 1 moves
    act2 = H.activity_from_snapshots(
        snap1,
        snap2,
        act1.select("cluster", "topic", "partition", "last_update"),
        t1,
        startup,
    )
    rows = {r.partition: r.last_update for r in act2.collect()}
    assert rows[0] == now  # carried forward from round 1
    assert rows[1] == t1  # progressed this round

    # round 3: nothing moves — both stamps must survive unchanged
    act3 = H.activity_from_snapshots(
        snap2,
        snap2,
        act2.select("cluster", "topic", "partition", "last_update"),
        t2,
        startup,
    )
    rows3 = {r.partition: r.last_update for r in act3.collect()}
    assert rows3 == {0: now, 1: t1}


def test_health_http_endpoint(spark, now):
    """/q/health binds a real port and mirrors Quarkus semantics: SmallRye
    JSON body, 200 when UP, 503 when DOWN, 404 elsewhere."""
    import json
    import urllib.error
    import urllib.request

    from console_datagen_spark.streaming.health_server import HealthServer

    fresh = now - timedelta(minutes=1)
    act_up = spark.createDataFrame(
        [("c", "t", 0, 100, fresh)],
        "cluster STRING, topic STRING, partition INT, count LONG, last_update TIMESTAMP",
    )
    state = {"frames": [("Records produced", H.health_summary(act_up, now))]}
    server = HealthServer(lambda: H.render_health_response(state["frames"]))
    host, port = server.start()
    try:
        with urllib.request.urlopen(f"http://{host}:{port}/q/health") as r:
            assert r.status == 200
            body = json.loads(r.read())
        assert body["status"] == "UP"
        assert body["checks"][0]["data"]["currentCount"] == 100
        # live/ready aliases serve the same payload
        with urllib.request.urlopen(f"http://{host}:{port}/q/health/ready") as r:
            assert r.status == 200

        # flip to DOWN: stale partition ⇒ 503 with the DOWN body
        act_down = act_up.withColumn(
            "last_update", F.lit(now - timedelta(minutes=10))
        )
        state["frames"] = [("Records produced", H.health_summary(act_down, now))]
        try:
            urllib.request.urlopen(f"http://{host}:{port}/q/health")
            raise AssertionError("expected HTTP 503")
        except urllib.error.HTTPError as e:
            assert e.code == 503
            assert json.loads(e.read())["status"] == "DOWN"

        try:
            urllib.request.urlopen(f"http://{host}:{port}/other")
            raise AssertionError("expected HTTP 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.stop()


def test_render_health_response_shape(spark, now):
    fresh = now - timedelta(minutes=1)
    act_up = spark.createDataFrame(
        [("c", "t", 0, 100, fresh)],
        "cluster STRING, topic STRING, partition INT, count LONG, last_update TIMESTAMP",
    )
    act_down = act_up.withColumn(
        "last_update", F.lit(now - timedelta(minutes=10))
    )
    resp = H.render_health_response(
        [
            ("Records produced", H.health_summary(act_up, now)),
            ("Records consumed", H.health_summary(act_down, now)),
        ]
    )
    assert resp["status"] == "DOWN"  # one failing check fails the endpoint
    names = {c["name"]: c["status"] for c in resp["checks"]}
    assert names == {"Records produced": "UP", "Records consumed": "DOWN"}
    data = resp["checks"][0]["data"]
    assert data["currentCount"] == 100
    assert data["inactivePartitions"] == 0
    assert data["latestActivity"].startswith("2024-01-01T")
