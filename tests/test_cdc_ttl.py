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


# ---- JVM-native default (event-time session-window spelling) ---------------

SCHEMA_TS = (
    "user_id LONG, event_id LONG, event_type STRING, value DOUBLE, ts TIMESTAMP"
)


def _ts_rows(spark, rows):
    """rows = (user_id, event_id, event_type, value, seconds-offset)."""
    import datetime

    base = datetime.datetime(2026, 1, 1, 12, 0, 0)
    return spark.createDataFrame(
        [
            (u, e, t, v, base + datetime.timedelta(seconds=s))
            for (u, e, t, v, s) in rows
        ],
        SCHEMA_TS,
    )


def test_jvm_ttl_eviction_parity(spark, tmp_path):
    """The JVM default (cdc_compact -> latest_wins_ttl_jvm) enforces the
    same TTL contract as the Python spelling, in event time: a key idle
    >= TTL emits once with its final latest-wins snapshot and its state
    is freed (a later arrival starts a fresh n_versions history), and
    keys not yet idle survive in state.  Event time makes the test
    deterministic AND fast — no wall-clock TTL waits."""
    from console_datagen_spark.streaming.cdc import cdc_compact, latest_wins

    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    ttl_ms = 10_000  # 10 s event-time TTL

    a = [
        (1, 10, "view", 1.5, 0),
        (2, 20, "view", 7.0, 1),
        (1, 11, "click", 2.5, 2),
        (1, 12, "purchase", 9.0, 5),
    ]
    # 20 - 5 = 15 s > TTL: user 1's first session closed, fresh history
    b = [(1, 13, "view", 3.0, 20), (99, 990, "view", 0.0, 100)]
    _ts_rows(spark, a).coalesce(1).write.mode("append").parquet(str(src))
    _ts_rows(spark, b).coalesce(1).write.mode("append").parquet(str(src))

    emitted = []

    def grab(batch_df, batch_id):
        emitted.extend(batch_df.collect())

    q = (
        cdc_compact(
            spark.readStream.schema(SCHEMA_TS).parquet(str(src)),
            ttl_ms=ttl_ms,
            # this harness writes event time monotonically per file, so
            # the per-key-ordered disorder bound (0) is correct here
            watermark_delay="0 seconds",
        )
        .writeStream.foreachBatch(grab)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.user_id, r.last_event_id, r.last_type, r.last_value, r.n_versions)
        for r in emitted
    }
    # same eviction contract the Python test asserts: final snapshot,
    # exactly once per idle period, fresh history after the gap
    assert got == {
        (1, 12, "purchase", 9.0, 3),  # first session: full history
        (2, 20, "view", 7.0, 1),  # idled out with its only version
        (1, 13, "view", 3.0, 1),  # state was freed, not resumed
    }
    assert all(r.evicted for r in emitted)
    # survivor: the sentinel key's session end (100s + TTL) is past the
    # watermark (100s), so it stays in state — never emitted
    assert not any(r.user_id == 99 for r in emitted)

    # close the survivor with a later sentinel; its snapshot must equal
    # the batch latest_wins aggregation over its full history (the same
    # survivor-parity assertion the Python test makes)
    _ts_rows(spark, [(98, 980, "view", 0.0, 200)]).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    emitted.clear()
    q2 = (
        cdc_compact(
            spark.readStream.schema(SCHEMA_TS).parquet(str(src)),
            ttl_ms=ttl_ms,
            watermark_delay="0 seconds",
        )
        .writeStream.foreachBatch(grab)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    closed = [r for r in emitted if r.user_id == 99]
    assert len(closed) == 1
    want = {
        r.user_id: r for r in latest_wins(_ts_rows(spark, b)).collect()
    }[99]
    assert (
        closed[0].last_event_id,
        closed[0].last_type,
        closed[0].last_value,
        closed[0].n_versions,
    ) == (want.last_event_id, want.last_type, want.last_value, want.n_versions)


def test_jvm_ttl_matches_batch_sessionization(spark):
    """Dual-derivation parity: the streaming session-window plan's closed
    sessions equal a batch gaps-and-islands sessionization (lag + cumsum)
    of the same records — the JVM spelling certified against independent
    SQL, not hand-picked expectations."""
    import random

    from console_datagen_spark.streaming.cdc import latest_wins_ttl_jvm

    rng = random.Random(7)
    rows, t = [], 0
    for i in range(400):
        t += rng.choice([1, 2, 3, 30])  # 30 s gaps split sessions
        rows.append(
            (
                rng.randrange(6),
                i,
                rng.choice(["view", "click", "purchase"]),
                round(rng.random() * 10, 1),
                t,
            )
        )
    df = _ts_rows(spark, rows)
    df.createOrReplaceTempView("cdc_rows")
    ttl_ms = 10_000

    expected = {
        tuple(r)
        for r in spark.sql(
            """
            WITH marked AS (
              SELECT *, CASE WHEN ts > lag(ts) OVER w + INTERVAL 10 SECONDS
                             OR lag(ts) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_session
              FROM cdc_rows
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sess AS (
              SELECT *, SUM(new_session) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id) AS sid
              FROM marked
            )
            SELECT user_id, max(event_id) AS last_event_id,
                   max_by(event_type, event_id) AS last_type,
                   max_by(value, event_id) AS last_value,
                   CAST(count(*) AS BIGINT) AS n_versions
            FROM sess GROUP BY user_id, sid
            """
        ).collect()
    }

    # batch-execute the streaming plan shape: session_window works on
    # batch frames too, so the same latest_wins_ttl_jvm definition runs
    # both ways (one logical definition, two execution modes — the
    # module's design rule)
    got = {
        (r.user_id, r.last_event_id, r.last_type, r.last_value, r.n_versions)
        for r in latest_wins_ttl_jvm(df, ttl_ms=ttl_ms).collect()
    }
    assert got == expected


def test_jvm_ttl_exact_gap_boundary(spark):
    """Pin the session-merge boundary the module docstring claims: an
    inter-event gap EXACTLY equal to the TTL merges into one session
    (so the batch oracle's strict `>` split matches), while ttl + 1 ms
    splits into two.  A Spark-version behavior change at the boundary
    flips this test, not just the randomized parity (r10 ADVICE)."""
    import datetime

    from console_datagen_spark.streaming.cdc import latest_wins_ttl_jvm

    base = datetime.datetime(2024, 1, 1)
    ttl_ms = 10_000

    def sessions(gap_ms):
        df = spark.createDataFrame(
            [
                (1, 10, "view", 1.0, base),
                (1, 11, "click", 2.0, base + datetime.timedelta(milliseconds=gap_ms)),
            ],
            SCHEMA_TS,
        )
        return sorted(
            (r.last_event_id, r.n_versions)
            for r in latest_wins_ttl_jvm(df, ttl_ms=ttl_ms).collect()
        )

    # exactly-gap: windows [t, t+ttl) and [t+ttl, t+2ttl) are adjacent —
    # Spark merges them, one session holding both versions
    assert sessions(ttl_ms) == [(11, 2)]
    # one past the gap: idle strictly > ttl, two sessions
    assert sessions(ttl_ms + 1) == [(10, 1), (11, 1)]


def test_jvm_ttl_stream_requires_explicit_watermark(spark, tmp_path):
    """Streaming input without an explicit watermark_delay must raise:
    a defaulted delay silently chooses a data-loss tolerance (events
    older than max-event-time - delay are dropped).  Batch input keeps
    the no-op '0 seconds' default (r10 ADVICE, medium)."""
    import datetime

    import pytest

    from console_datagen_spark.streaming.cdc import (
        cdc_compact,
        latest_wins_ttl_jvm,
    )

    src = tmp_path / "wm_src"
    base = datetime.datetime(2024, 1, 1)
    batch = spark.createDataFrame([(1, 10, "view", 1.0, base)], SCHEMA_TS)
    batch.write.parquet(str(src))

    stream = spark.readStream.schema(SCHEMA_TS).parquet(str(src))
    with pytest.raises(ValueError, match="watermark_delay"):
        latest_wins_ttl_jvm(stream)
    with pytest.raises(ValueError, match="watermark_delay"):
        cdc_compact(stream)

    # batch: None resolves to the no-op watermark, plan builds fine
    assert latest_wins_ttl_jvm(batch).count() == 1


def test_cdc_live_view_open_session_read(spark, tmp_path):
    """r10 verdict #3: the JVM path gets a LIVE read. CdcLiveView folds
    each micro-batch into an open-session snapshot with only JVM
    operators; mid-stream it must serve exactly what the Python
    spelling's update rows described (live keys' latest-wins state),
    and its closed-session log must match the append-mode session
    query's eviction contract."""
    from console_datagen_spark.streaming.cdc import (
        CdcLiveView,
        latest_wins_stateful,
    )

    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    ttl_ms = 10_000

    a = [
        (1, 10, "view", 1.5, 0),
        (2, 20, "view", 7.0, 1),
        (1, 11, "click", 2.5, 2),
        (1, 12, "purchase", 9.0, 5),
    ]
    b = [(1, 13, "view", 3.0, 20), (99, 990, "view", 0.0, 100)]
    # two sessions for ONE key inside a single batch (50 s gap > TTL)
    c = [(5, 50, "view", 1.0, 200), (5, 51, "click", 2.0, 250)]

    closed = []
    view = CdcLiveView(
        ttl_ms=ttl_ms,
        on_closed=lambda df: closed.extend(df.collect()),
    )

    def run_once():
        q = (
            spark.readStream.schema(SCHEMA_TS)
            .parquet(str(src))
            .writeStream.foreachBatch(view.update)
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def snap():
        return {
            r.user_id: (r.last_event_id, r.last_type, r.last_value, r.n_versions)
            for r in view.snapshot().collect()
        }

    _ts_rows(spark, a).coalesce(1).write.mode("append").parquet(str(src))
    run_once()
    # frontier = 5 s: nothing idle > 10 s yet — both keys live, merged
    assert snap() == {1: (12, "purchase", 9.0, 3), 2: (20, "view", 7.0, 1)}
    assert not closed

    # mid-stream parity vs the Python spelling: its live (non-evicted)
    # update rows for the same prefix describe the same state
    emitted = []
    q = (
        latest_wins_stateful(
            spark.readStream.schema(SCHEMA_TS).parquet(str(src)),
            ttl_ms=3_600_000,  # wall-clock TTL far beyond the test
        )
        .writeStream.foreachBatch(lambda df, _id: emitted.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "py_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    py_live = {
        r.user_id: (r.last_event_id, r.last_type, r.last_value, r.n_versions)
        for r in emitted
        if not r.evicted
    }
    assert py_live == snap()

    _ts_rows(spark, b).coalesce(1).write.mode("append").parquet(str(src))
    run_once()
    # frontier = 100 s: user 1's first session (last_ts 5) closed by the
    # 15 s gap, its second (last_ts 20) idled out, user 2 idled out;
    # only the 100 s sentinel survives
    assert snap() == {99: (990, "view", 0.0, 1)}
    got_closed = {
        (r.user_id, r.last_event_id, r.last_type, r.last_value, r.n_versions)
        for r in closed
    }
    # identical to the eviction set the append-mode session query emits
    # for this source (test_jvm_ttl_eviction_parity's contract)
    assert got_closed == {
        (1, 12, "purchase", 9.0, 3),
        (2, 20, "view", 7.0, 1),
        (1, 13, "view", 3.0, 1),
    }
    assert all(r.evicted for r in closed)

    _ts_rows(spark, c).coalesce(1).write.mode("append").parquet(str(src))
    run_once()
    # intra-batch split: session (50) closed inside the batch, (51) open;
    # the 100 s sentinel idled out against the 250 s frontier
    assert snap() == {5: (51, "click", 2.0, 1)}
    got_closed = {
        (r.user_id, r.last_event_id, r.last_type, r.last_value, r.n_versions)
        for r in closed
    }
    assert (5, 50, "view", 1.0, 1) in got_closed
    assert (99, 990, "view", 0.0, 1) in got_closed


def test_cdc_live_view_bridging_and_restore(spark, tmp_path):
    """Out-of-order events that BRIDGE the held session to later ones
    must re-merge into ONE open session (the canonical state-store
    behavior a first-session-only chaining rule gets wrong), and a
    persisted snapshot must seed a fresh view via restore()."""
    from console_datagen_spark.streaming.cdc import CdcLiveView

    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    ttl_ms = 10_000

    view = CdcLiveView(ttl_ms=ttl_ms, watermark_delay_ms=5_000)

    def run_once():
        q = (
            spark.readStream.schema(SCHEMA_TS)
            .parquet(str(src))
            .writeStream.foreachBatch(view.update)
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: key 1 session with last_ts = 100 s, 5 versions
    a = [(1, 10 + i, "view", 1.0 * i, 96 + i) for i in range(5)]  # 96..100
    _ts_rows(spark, a).coalesce(1).write.mode("append").parquet(str(src))
    run_once()
    # frontier = 100 - 5 = 95 s
    snap = view.snapshot().collect()
    assert [(r.last_event_id, r.n_versions) for r in snap] == [(14, 5)]

    # batch 2: out-of-order 96 s (admissible: >= frontier 95) + 108 s.
    # Intra-batch alone these split (gap 12 s > ttl), but the held
    # session's last_ts = 100 bridges both => ONE open session, n = 7.
    b = [(1, 20, "click", 2.0, 96), (1, 21, "purchase", 3.0, 108)]
    _ts_rows(spark, b).coalesce(1).write.mode("append").parquet(str(src))
    run_once()
    snap = view.snapshot().collect()
    assert [
        (r.last_event_id, r.last_type, r.n_versions) for r in snap
    ] == [(21, "purchase", 7)]

    # restore(): a fresh view seeded from the persisted snapshot frame
    # serves the same state before any batch, and folding the NEXT
    # (unseen) events continues the history — n_versions accumulates,
    # not resets. restore() pairs with RESUMING the source checkpoint
    # (replaying from scratch would double-count into the pseudo-event).
    snap_path = str(tmp_path / "snap_store")
    view.snapshot().write.parquet(snap_path)
    view2 = CdcLiveView(ttl_ms=ttl_ms, watermark_delay_ms=5_000)
    view2.restore(spark.read.parquet(snap_path))
    got = {
        (r.user_id, r.last_event_id, r.n_versions)
        for r in view2.snapshot().collect()
    }
    assert got == {(1, 21, 7)}
    c = [(1, 22, "view", 4.0, 112)]
    _ts_rows(spark, c).coalesce(1).write.mode("append").parquet(str(src))
    run_once_v2 = (
        spark.readStream.schema(SCHEMA_TS)
        .parquet(str(src))
        .writeStream.foreachBatch(view2.update)
        .option("checkpointLocation", str(ckpt))  # RESUME: only file c
        .trigger(availableNow=True)
        .start()
    )
    run_once_v2.awaitTermination(120)
    got = {
        (r.user_id, r.last_event_id, r.n_versions)
        for r in view2.snapshot().collect()
    }
    assert got == {(1, 22, 8)}

    # delay > ttl is rejected at construction (under-merge hazard)
    import pytest

    with pytest.raises(ValueError, match="watermark_delay_ms"):
        CdcLiveView(ttl_ms=1_000, watermark_delay_ms=2_000)


def test_cdc_live_view_restart_durability(spark, tmp_path):
    """r11 verdict #2 + ADVICE: with ``snapshot_path`` set, the view
    persists survivors + frontier + last batch id after every batch;
    after a simulated driver restart (view object dropped),
    ``restore_from_path`` reseeds all three and the resumed source
    checkpoint replays only unfolded batches — the final snapshot
    equals an uninterrupted run's. Also pins the at-least-once replay
    guard (re-folding an already-folded batch_id is a no-op) and the
    ``restore()`` frontier floor (post-restore late events are dropped
    exactly as the canonical query's persisted watermark would)."""
    from console_datagen_spark.streaming.cdc import CdcLiveView

    ttl_ms = 10_000

    def run_once(view, src, ckpt):
        q = (
            spark.readStream.schema(SCHEMA_TS)
            .parquet(str(src))
            .writeStream.foreachBatch(view.update)
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def snap_set(view):
        return {
            (r.user_id, r.last_event_id, r.last_type, r.n_versions)
            for r in view.snapshot().collect()
        }

    a = [(1, 10, "view", 1.0, 0), (2, 20, "view", 2.0, 3)]
    b = [(1, 11, "click", 3.0, 8), (3, 30, "view", 4.0, 9)]
    c = [(1, 12, "purchase", 5.0, 14), (2, 21, "click", 6.0, 30)]

    # interrupted run: fold a, b with persistence, then "crash"
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    store = str(tmp_path / "live_store")
    view_a = CdcLiveView(
        ttl_ms=ttl_ms, watermark_delay_ms=5_000, snapshot_path=store
    )
    _ts_rows(spark, a).coalesce(1).write.mode("append").parquet(str(src))
    run_once(view_a, src, ckpt)
    _ts_rows(spark, b).coalesce(1).write.mode("append").parquet(str(src))
    run_once(view_a, src, ckpt)
    pre_crash = snap_set(view_a)
    pre_frontier = view_a._frontier
    del view_a  # the restart: in-memory snapshot, frontier, batch id all gone

    view_b = CdcLiveView(
        ttl_ms=ttl_ms, watermark_delay_ms=5_000, snapshot_path=store
    )
    assert view_b.restore_from_path(spark) is True
    # all three pieces of state come back exactly
    assert snap_set(view_b) == pre_crash
    assert view_b._frontier == pre_frontier
    assert view_b._last_batch_id == 1

    # replay guard: foreachBatch is at-least-once — re-delivering the
    # last committed batch must NOT fold twice (n_versions unchanged)
    view_b.update(_ts_rows(spark, b), batch_id=1)
    assert snap_set(view_b) == pre_crash

    # resume: only the unfolded batch c replays off the source checkpoint
    _ts_rows(spark, c).coalesce(1).write.mode("append").parquet(str(src))
    run_once(view_b, src, ckpt)
    resumed = snap_set(view_b)

    # uninterrupted control: same batches, fresh view, no crash
    src2, ckpt2 = tmp_path / "src2", tmp_path / "ckpt2"
    view_c = CdcLiveView(ttl_ms=ttl_ms, watermark_delay_ms=5_000)
    for batch in (a, b, c):
        _ts_rows(spark, batch).coalesce(1).write.mode("append").parquet(
            str(src2)
        )
        run_once(view_c, src2, ckpt2)
    assert resumed == snap_set(view_c)

    # a second restart restores the post-resume state too (persistence
    # ran on every batch, not just the first run's)
    view_d = CdcLiveView(
        ttl_ms=ttl_ms, watermark_delay_ms=5_000, snapshot_path=store
    )
    assert view_d.restore_from_path(spark) is True
    assert snap_set(view_d) == resumed
    assert view_d._last_batch_id == 2

    # restore_from_path with no manifest is a clean no-op
    view_e = CdcLiveView(
        ttl_ms=ttl_ms, snapshot_path=str(tmp_path / "never_written")
    )
    assert view_e.restore_from_path(spark) is False


def test_cdc_live_view_restore_frontier_floor(spark, tmp_path):
    """ADVICE r11: plain ``restore()`` must derive a frontier floor
    (max(last_ts) − delay) so the first post-restore batch drops events
    the canonical query's persisted watermark would have dropped,
    instead of admitting arbitrarily late rows."""
    from console_datagen_spark.streaming.cdc import CdcLiveView

    ttl_ms, delay_ms = 10_000, 5_000
    view = CdcLiveView(ttl_ms=ttl_ms, watermark_delay_ms=delay_ms)
    view.update(_ts_rows(spark, [(1, 10, "view", 1.0, 20)]), batch_id=0)
    snap_path = str(tmp_path / "snap")
    view.snapshot().write.parquet(snap_path)

    fresh = CdcLiveView(ttl_ms=ttl_ms, watermark_delay_ms=delay_ms)
    fresh.restore(spark.read.parquet(snap_path))
    assert fresh._frontier is not None  # floor = 20 s − 5 s = 15 s

    # a 12 s event is older than the floor: the watermark contract says
    # drop it — n_versions must stay 1, not merge to 2
    fresh.update(_ts_rows(spark, [(1, 11, "late", 0.0, 12)]), batch_id=0)
    rows = fresh.snapshot().collect()
    assert [(r.last_event_id, r.n_versions) for r in rows] == [(10, 1)]

    # an 18 s event is admissible (>= floor): it merges normally
    fresh.update(_ts_rows(spark, [(1, 12, "ok", 2.0, 18)]), batch_id=1)
    rows = fresh.snapshot().collect()
    assert [(r.last_event_id, r.n_versions) for r in rows] == [(12, 2)]
