"""TTL'd streaming CDC: latest-wins state + idle-key eviction.

Certifies the round-5 eviction tier (reference's 5-minute staleness,
CounterProgressCheck.java:80-90, as state eviction): a key with no
arrivals within the TTL is emitted once with evicted=true and dropped
from the state store; survivors stay parity-equal with the batch
``latest_wins`` aggregation over their full history.

Harness note: ProcessingTimeTimeout makes pending timers count as
available work (FlatMapGroupsWithStateExec.shouldRunAnotherBatch), so an
availableNow run would linger until every timer fires — instead ONE
continuously-triggered query runs while the test appends files, and the
emitted rows are asserted afterwards.
"""

import threading
import time

from console_datagen_spark.streaming.cdc import latest_wins, latest_wins_stateful

SCHEMA = "user_id LONG, event_id LONG, event_type STRING, value DOUBLE"
# comfortably larger than worst-case inter-batch latency in this harness
# (query startup alone can take ~10 s), so only the deliberately idled
# key ever reaches its deadline during the test
TTL_MS = 15_000
DEADLINE_S = 90


def _write(spark, src_dir, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
        str(src_dir)
    )


def _await(emitted, lock, pred, deadline_s=DEADLINE_S):
    t0 = time.time()
    while time.time() - t0 < deadline_s:
        with lock:
            snap = list(emitted)
        if any(pred(r) for r in snap):
            return snap
        time.sleep(0.25)
    raise AssertionError(f"condition not met within {deadline_s}s: {emitted}")


def test_ttl_eviction_and_survivor_parity(spark, tmp_path):
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    emitted, lock = [], threading.Lock()

    def grab(batch_df, batch_id):
        rows = batch_df.collect()
        with lock:
            emitted.extend(rows)

    # seed the source dir so the stream can infer its existence
    a = [(1, 10, "view", 1.5), (1, 11, "click", 2.5), (2, 20, "view", 7.0)]
    _write(spark, src, a)
    q = (
        latest_wins_stateful(
            spark.readStream.schema(SCHEMA).parquet(str(src)), ttl_ms=TTL_MS
        )
        .writeStream.foreachBatch(grab)
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        # both keys surface as live updates
        _await(emitted, lock, lambda r: r.user_id == 2 and not r.evicted)
        _await(emitted, lock, lambda r: r.user_id == 1 and not r.evicted)

        # keep user 1 alive past user 2's idle deadline
        b = [(1, 12, "purchase", 9.0)]
        _write(spark, src, b)
        _await(
            emitted, lock, lambda r: r.user_id == 1 and r.last_event_id == 12
        )

        # user 2 idles out: emitted once with evicted=true + final snapshot
        snap = _await(emitted, lock, lambda r: r.user_id == 2 and r.evicted)
        evi = [r for r in snap if r.user_id == 2 and r.evicted]
        assert evi[0].last_event_id == 20 and evi[0].n_versions == 1

        # post-eviction arrival restarts a fresh version history
        _write(spark, src, [(2, 30, "click", 4.0)])
        snap = _await(
            emitted,
            lock,
            lambda r: r.user_id == 2 and not r.evicted and r.last_event_id == 30,
        )
        fresh = [
            r
            for r in snap
            if r.user_id == 2 and not r.evicted and r.last_event_id == 30
        ]
        assert fresh[0].n_versions == 1  # state was freed, not resumed
    finally:
        q.stop()

    # survivor parity: user 1's final live row equals the batch latest_wins
    # aggregation over its full history
    batch = {
        r.user_id: r
        for r in latest_wins(spark.createDataFrame(a + b, SCHEMA)).collect()
    }
    live1 = [r for r in emitted if r.user_id == 1 and not r.evicted][-1]
    want = batch[1]
    assert (
        live1.last_event_id,
        live1.last_type,
        live1.last_value,
        live1.n_versions,
    ) == (want.last_event_id, want.last_type, want.last_value, want.n_versions)

    # eviction emits exactly once per idle period for user 2
    assert sum(1 for r in emitted if r.user_id == 2 and r.evicted) == 1


def test_tws_timer_eviction(spark, tmp_path):
    """transformWithState spelling (explicit timers): same eviction
    contract. Gated on the protobuf wheel (the Python state-server
    protocol) + RocksDB provider, like the counter TWS test."""
    import pytest

    pytest.importorskip("google.protobuf")
    from console_datagen_spark.streaming.cdc import latest_wins_tws

    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    emitted, lock = [], threading.Lock()

    def grab(batch_df, batch_id):
        rows = batch_df.collect()
        with lock:
            emitted.extend(rows)

    _write(spark, src, [(1, 10, "view", 1.5), (2, 20, "view", 7.0)])
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            latest_wins_tws(
                spark.readStream.schema(SCHEMA).parquet(str(src)), ttl_ms=TTL_MS
            )
            .writeStream.foreachBatch(grab)
            .outputMode("update")
            .option("checkpointLocation", str(ckpt))
            .trigger(processingTime="500 milliseconds")
            .start()
        )
        try:
            _await(emitted, lock, lambda r: r.user_id == 2 and not r.evicted)
            _write(spark, src, [(1, 12, "purchase", 9.0)])
            _await(
                emitted, lock, lambda r: r.user_id == 1 and r.last_event_id == 12
            )
            snap = _await(emitted, lock, lambda r: r.user_id == 2 and r.evicted)
            evi = [r for r in snap if r.user_id == 2 and r.evicted]
            assert evi[0].last_event_id == 20 and evi[0].n_versions == 1
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
