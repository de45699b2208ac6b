"""Latest-record-wins (CDC/changelog) compaction — one definition, both
execution modes.

The reference's counter map IS a latest-wins view: every record overwrites
the previous value for its (cluster, topic, partition) key
(DataGenerator.java:548-551). The batch analog is the registered
``cdc_latest_state`` query (plans/sequences.py); this module expresses the
same semantics as a streaming aggregation so ONE logical definition runs
over a bounded frame (batch) or an unbounded stream (update/complete
mode), and the parity test certifies they agree.

Why ``max_by`` instead of the batch query's row_number window: streaming
aggregations can't host ranking windows (unbounded sort per key), but
``max_by(col, event_id)`` is an incrementally-maintainable aggregate —
Spark keeps one (value, max_id) pair per key in the state store, O(keys)
state forever, no watermark needed. At 100 TB of changelog this is the
difference between a compaction job you re-run and a view that is always
current.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def latest_wins(records: DataFrame, key_cols: tuple[str, ...] = ("user_id",)) -> DataFrame:
    """Current-state snapshot of an append-only change stream.

    Works identically on a batch frame and a streaming one (update or
    complete output mode). Ordering is by ``event_id`` (dense, unique —
    FIXTURES.md D3), ties impossible.
    """
    return records.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.max("event_id").alias("last_event_id"),
        F.max_by("event_type", "event_id").alias("last_type"),
        F.max_by("value", "event_id").alias("last_value"),
        F.count("*").cast("bigint").alias("n_versions"),
    )


# ---- TTL'd-key variant: latest-wins + idle-key eviction --------------------
#
# The plain max_by aggregation keeps O(keys) state FOREVER. The reference
# treats a partition with no activity for 5 minutes as stale
# (CounterProgressCheck.java:80-90); this variant turns that staleness
# tier into state EVICTION: a key idle longer than the TTL is dropped
# from the state store and reported once with evicted=true. At 100 TB of
# changelog with a churning key space, that is the difference between
# state bounded by the ACTIVE key count and state that grows without
# bound over the job's lifetime.

CDC_TTL_MS = 5 * 60 * 1000  # the reference's 5-minute staleness tier

CDC_STATE_SCHEMA = (
    "last_event_id LONG, last_type STRING, last_value DOUBLE, n_versions LONG"
)
CDC_OUTPUT_SCHEMA = (
    "user_id LONG, last_event_id LONG, last_type STRING, last_value DOUBLE, "
    "n_versions LONG, evicted BOOLEAN"
)


def _make_cdc_ttl_update(ttl_ms: int):
    """Update function bound to one TTL (closure — cloudpickle ships the
    bound value to executors; tests shrink it to seconds so eviction is
    observable without waiting 5 minutes)."""

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # no record for this key within the TTL: emit the final
            # snapshot flagged evicted and free the state slot (a later
            # record for the key starts a fresh version history)
            last_id, last_type, last_value, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "last_event_id": [last_id],
                    "last_type": [last_type],
                    "last_value": [last_value],
                    "n_versions": [n],
                    "evicted": [True],
                }
            )
            return
        best = state.get if state.exists else (-1, None, None, 0)
        last_id, last_type, last_value, n = best
        for pdf in batches:
            n += len(pdf)
            mx = int(pdf["event_id"].max())
            if mx > last_id:
                row = pdf.loc[pdf["event_id"].idxmax()]
                last_id = mx
                last_type = str(row["event_type"])
                last_value = float(row["value"])
        state.update((last_id, last_type, last_value, n))
        # reset the idle clock on every arrival (timeouts re-arm per
        # invocation, so the deadline is always last-activity + TTL)
        state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "last_event_id": [last_id],
                "last_type": [last_type],
                "last_value": [last_value],
                "n_versions": [n],
                "evicted": [False],
            }
        )

    return update


def latest_wins_stateful(records: DataFrame, ttl_ms: int = CDC_TTL_MS) -> DataFrame:
    """Streaming latest-wins compaction with idle-key TTL eviction.

    Same per-key result columns as ``latest_wins`` plus ``evicted``:
    update-mode rows carry evicted=false; a key silent for ``ttl_ms``
    (default: the reference's 5-minute staleness tier) is emitted once
    with evicted=true and removed from the state store. Uses
    ``applyInPandasWithState`` with a processing-time timeout — the
    executable spelling in this container; ``CdcTtlProcessor`` below is
    the transformWithState timer spelling.
    """
    return (
        records.select("user_id", "event_id", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_cdc_ttl_update(ttl_ms),
            outputStructType=CDC_OUTPUT_SCHEMA,
            stateStructType=CDC_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


# ---- JVM-native TTL spelling (the hot-path default) ------------------------
#
# r9's soak measured the cost of Python state on local[32]: the
# applyInPandasWithState kernel saturates ~800 k rows/s while an
# equivalent JVM keyed aggregation sustains >= 25.6 M rows/s — a >= 33x
# gap that is pure Arrow-transfer + Python-kernel overhead (SOAK.json,
# r9). Latest-wins + idle-key TTL does not need a Python kernel: in
# EVENT time, "key idle longer than TTL" is exactly an event-time
# SESSION WINDOW with gap = TTL. Spark's session-window aggregation is
# fully JVM-side (incremental merge in the state store, watermark-driven
# eviction), so the default CDC spelling below keeps the hot path on the
# JVM and leaves `latest_wins_stateful` as the fallback for the one
# semantic JVM ops cannot express: PROCESSING-time TTL with live
# per-batch update rows (wall-clock staleness when events carry no
# usable timestamp — the reference's own staleness tier,
# CounterProgressCheck.java:80-90, is wall-clock).
#
# Contract (append mode): each emitted row is one closed idle period —
# the final latest-wins snapshot of a key's version history at the
# moment it had been silent for > ttl in event time (exactly-ttl gaps merge; boundary pinned in tests) (evicted=true by
# construction). Open sessions are the survivors: exactly the keys the
# Python spelling would still hold in state. A later record after an
# idle gap starts a fresh session => fresh n_versions, matching the
# Python spelling's "state was freed, not resumed".


def latest_wins_ttl_jvm(
    records: DataFrame,
    ttl_ms: int = CDC_TTL_MS,
    ts_col: str = "ts",
    watermark_delay: str | None = None,
) -> DataFrame:
    """Latest-wins CDC with TTL eviction, entirely JVM-side.

    Event-time twin of ``latest_wins_stateful``: session window with
    gap = ``ttl_ms`` over ``ts_col``; run in APPEND output mode, where
    every emitted row is an eviction record (idle > TTL at the
    watermark) and state holds only open sessions. ~33x the Python
    spelling's throughput on local[32] (SOAK.json).

    ``watermark_delay`` is the source's DISORDER BOUND and is REQUIRED
    for streaming input: any event older than (max event time seen -
    delay) is silently dropped by the watermark, so a defaulted value
    would quietly pick a data-loss tolerance on the caller's behalf
    (the Python spelling has no such loss mode — r10 ADVICE). Pass
    ``"0 seconds"`` only when the source is per-key ordered (or the
    producer guarantees monotone event time); otherwise set it to the
    source's measured disorder (the soak uses ``"2 seconds"``).
    MEASURE it with ``streaming.disorder``: ``measure_disorder()``
    over a bounded sample carrying an arrival-order column, or
    ``DisorderMonitor`` riding foreachBatch on a sample stream —
    ``report()['suggested_watermark_delay']`` is the zero-loss value
    in this argument's exact format. On a batch frame the watermark is
    a Catalyst no-op, so ``None`` resolves to ``"0 seconds"`` there.
    """
    if watermark_delay is None:
        if records.isStreaming:
            raise ValueError(
                "latest_wins_ttl_jvm on a STREAM requires an explicit "
                "watermark_delay (the source's out-of-order bound): "
                "events older than max-event-time - delay are dropped, "
                "so a library default would silently choose your data-"
                "loss tolerance. Pass '0 seconds' only for per-key "
                "ordered sources; otherwise the measured disorder "
                "(e.g. '2 seconds'), or use time_mode='processing' "
                "for wall-clock TTL with no event-time loss mode."
            )
        watermark_delay = "0 seconds"
    gap = f"{ttl_ms} milliseconds"
    return (
        records.withWatermark(ts_col, watermark_delay)
        .groupBy(F.session_window(ts_col, gap), "user_id")
        .agg(
            F.max("event_id").alias("last_event_id"),
            F.max_by("event_type", "event_id").alias("last_type"),
            F.max_by("value", "event_id").alias("last_value"),
            F.count("*").cast("bigint").alias("n_versions"),
        )
        .select(
            "user_id",
            "last_event_id",
            "last_type",
            "last_value",
            "n_versions",
            F.lit(True).alias("evicted"),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
        )
    )


def cdc_compact(
    records: DataFrame,
    ttl_ms: int = CDC_TTL_MS,
    time_mode: str = "event",
    ts_col: str = "ts",
    watermark_delay: str | None = None,
) -> DataFrame:
    """The streaming tier's CDC entry point. Default = the JVM spelling.

    ``time_mode="event"`` (default): ``latest_wins_ttl_jvm`` — session
    windows, JVM state, >= 5 M rows/s sustained (SOAK.json jvm_cdc
    ladder). Streaming callers MUST pass ``watermark_delay`` (the
    source's disorder bound — see ``latest_wins_ttl_jvm``); there is no
    default because a default would silently pick a data-loss
    tolerance. ``time_mode="processing"``: ``latest_wins_stateful`` —
    wall-clock TTL + live update rows, the semantics JVM aggregation
    cannot express, at the measured ~800 k rows/s Python-state ceiling.
    """
    if time_mode == "event":
        return latest_wins_ttl_jvm(
            records, ttl_ms=ttl_ms, ts_col=ts_col,
            watermark_delay=watermark_delay,
        )
    if time_mode == "processing":
        return latest_wins_stateful(records, ttl_ms=ttl_ms)
    raise ValueError(f"time_mode must be 'event' or 'processing': {time_mode!r}")


# ---- live open-session read for the JVM path (foreachBatch snapshot) ------
#
# latest_wins_ttl_jvm runs in APPEND mode: it emits only CLOSED
# sessions, so the reference's health read (CounterProgressCheck.java:
# 37-130 reads the CURRENT counter map) had to fall back to the ~800 k
# rows/s Python spelling for live keys (r10 verdict #3). CdcLiveView
# closes that gap on the JVM path: a foreachBatch companion that folds
# each micro-batch into an O(active keys) snapshot frame using ONLY
# JVM operators — per-batch session_window aggregation, one outer-join
# merge against the held snapshot, frontier-based idle eviction — so
# the 5 M rows/s default also serves the live read. Python appears
# solely as driver-side orchestration (two bounded 1-row collects per
# batch: the batch max event time and nothing else); no row crosses
# the Arrow boundary.
#
# Semantics match the session-window spelling exactly (pinned by
# tests): an event at exactly last_ts + TTL merges into the open
# session; a key idles out when the frontier (running max event time
# minus the watermark delay) exceeds last_ts + TTL strictly; a closed
# key reappearing starts a FRESH n_versions history. Closed sessions
# are handed to an optional ``on_closed`` callback as a DataFrame per
# batch (write them to your sink; the default discards them because
# the append-mode query is the canonical eviction emitter) — never
# accumulated driver-side.
#
# Scale: the snapshot is cached and lineage-truncated via
# localCheckpoint every batch (an unbounded union-of-batches plan is
# the classic foreachBatch OOM); its size is bounded by the ACTIVE key
# count, same as the session-window state store. The merge is a join
# between two O(keys) frames on the grouping key — at cluster scale
# both sides hash-partition on user_id and AQE handles skew.

LIVE_SNAPSHOT_COLS = (
    "user_id",
    "last_event_id",
    "last_type",
    "last_value",
    "n_versions",
    "last_ts",
)


class CdcLiveView:
    """Open-session latest-wins snapshot over a raw change stream.

    Attach with ``.writeStream.foreachBatch(view.update)`` on the SAME
    source the append-mode ``latest_wins_ttl_jvm`` query reads;
    ``view.snapshot()`` is then the live state the Python spelling
    served via update rows — every open session's latest-wins record.

    ``on_closed`` receives each batch's closed-session DataFrame INSIDE
    the fold and must materialize it synchronously (write/collect): the
    frame references the pre-merge snapshot, which is released when the
    fold swaps in the new one.

    Fold mechanics (faithful to the session-window state store): the
    snapshot holds one row per OPEN SESSION; each batch, those rows
    re-enter the sessionization as weighted pseudo-events (event time =
    the session's last_ts, weight = its n_versions) unioned with the
    batch's real events, and ``session_window`` re-merges everything —
    including out-of-order events that BRIDGE the held session to later
    ones, the case a first-session-only chaining rule gets wrong. A
    session closes ONLY when the frontier passes its end (idle strictly
    > TTL), exactly the watermark rule, so with ``watermark_delay_ms``
    > 0 a key can transiently hold several open sessions — the same
    state the canonical query's store holds. The pseudo-event point
    stands in for the held session's full interval exactly when
    ``watermark_delay_ms <= ttl_ms`` (any event the watermark still
    admits lands within TTL of last_ts); larger delays are rejected at
    construction.

    Durability: by default state is in-memory (plus executor blocks via
    localCheckpoint) — a driver restart loses the snapshot even though
    the checkpointed SOURCE resumes mid-stream. Pass ``snapshot_path``
    to persist the fold's survivors (an O(active keys) parquet) plus the
    frontier and last batch id after EVERY batch; after a restart,
    ``restore_from_path()`` reseeds all three and the resumed source
    checkpoint replays only unfolded batches. The per-batch write is an
    atomic pointer swap (new parquet dir, then os.replace of a LATEST
    manifest), so a crash mid-write leaves the previous batch's snapshot
    intact. ``snapshot_path`` must be driver-visible AND reachable by
    ``spark.read`` (local/NFS path on local mode; on a cluster point it
    at shared storage — the manifest swap needs a rename-capable FS).

    Replay safety: foreachBatch is at-least-once — after a failure the
    last batch can re-run with the SAME batch_id. ``update`` folds each
    batch_id exactly once (a ``batch_id <= last folded`` guard skips
    replays), so n_versions never double-counts.
    """

    def __init__(
        self,
        ttl_ms: int = CDC_TTL_MS,
        ts_col: str = "ts",
        watermark_delay_ms: int = 0,
        on_closed=None,
        snapshot_path: str | None = None,
    ) -> None:
        if watermark_delay_ms > ttl_ms:
            raise ValueError(
                "CdcLiveView requires watermark_delay_ms <= ttl_ms "
                f"({watermark_delay_ms} > {ttl_ms}): beyond that, the "
                "watermark admits events older than the snapshot's "
                "pseudo-event horizon and the fold can under-merge vs "
                "the canonical session store."
            )
        self._ttl_ms = ttl_ms
        self._ts = ts_col
        self._delay_ms = watermark_delay_ms
        self._on_closed = on_closed
        self._snapshot_path = snapshot_path
        self._snap: DataFrame | None = None
        self._frontier = None  # running max event time - delay
        self._last_batch_id: int | None = None

    def restore(self, snapshot_df: DataFrame) -> None:
        """Seed the held state from a persisted ``snapshot()`` frame
        (driver-restart recovery). Accepts the snapshot schema with or
        without the ``evicted`` marker column.

        Also derives a frontier FLOOR from the restored rows —
        max(last_ts) − watermark_delay — so the first post-restore batch
        does not admit arbitrarily late events the canonical query's
        persisted watermark would drop (and eviction resumes without
        waiting for a non-empty batch). The floor is conservative: the
        true frontier is max event time EVER seen − delay, which can be
        later (closed sessions since evicted); ``restore_from_path``
        restores the exact persisted value instead."""
        import datetime

        cols = [c for c in LIVE_SNAPSHOT_COLS]
        self._snap = snapshot_df.select(*cols).localCheckpoint(eager=True)
        mx = self._snap.agg(F.max("last_ts").alias("m")).collect()[0]["m"]
        if mx is not None:
            floor = mx - datetime.timedelta(milliseconds=self._delay_ms)
            if self._frontier is None or floor > self._frontier:
                self._frontier = floor

    def restore_from_path(self, spark) -> bool:
        """Reseed snapshot, frontier, and last-folded batch id from the
        ``snapshot_path`` manifest written by a previous run. Returns
        True if a manifest was found (False = nothing to restore — e.g.
        first-ever start). Call BEFORE restarting the query on its
        resumed source checkpoint."""
        import datetime
        import json
        import os

        if self._snapshot_path is None:
            raise ValueError("restore_from_path requires snapshot_path")
        manifest = os.path.join(self._snapshot_path, "LATEST")
        if not os.path.exists(manifest):
            return False
        with open(manifest, encoding="utf-8") as f:
            meta = json.load(f)
        if meta.get("dir") is not None:
            snap = spark.read.parquet(
                os.path.join(self._snapshot_path, meta["dir"])
            )
            self._snap = snap.select(*LIVE_SNAPSHOT_COLS).localCheckpoint(
                eager=True
            )
        if meta.get("frontier") is not None:
            self._frontier = datetime.datetime.fromisoformat(meta["frontier"])
        self._last_batch_id = meta.get("batch_id")
        return True

    def _persist(self, batch_id: int) -> None:
        """Write survivors + manifest for ``batch_id`` (atomic pointer
        swap: parquet into a fresh dir, then os.replace of LATEST;
        readers never observe a half-written snapshot). Older snapshot
        dirs are swept AFTER the swap — at most one extra batch's
        parquet ever lingers."""
        import json
        import os
        import shutil

        path = self._snapshot_path
        os.makedirs(path, exist_ok=True)
        dirname = None
        if self._snap is not None:
            dirname = f"snap-{batch_id}"
            self._snap.write.mode("overwrite").parquet(
                os.path.join(path, dirname)
            )
        meta = {
            "batch_id": batch_id,
            "frontier": self._frontier.isoformat()
            if self._frontier is not None
            else None,
            "dir": dirname,
        }
        tmp = os.path.join(path, ".LATEST.tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(path, "LATEST"))
        for entry in os.listdir(path):
            if entry.startswith("snap-") and entry != dirname:
                shutil.rmtree(os.path.join(path, entry), ignore_errors=True)

    # -- per-batch fold (foreachBatch signature) -----------------------------

    def update(self, batch_df: DataFrame, batch_id: int) -> None:
        import datetime

        # at-least-once replay guard: foreachBatch can re-deliver the
        # last batch (same batch_id) after a post-fold failure; folding
        # it again would double-count n_versions vs the canonical query.
        if self._last_batch_id is not None and batch_id <= self._last_batch_id:
            return

        ts, ttl_ms = self._ts, self._ttl_ms
        gap = f"{ttl_ms} milliseconds"
        ttl = F.expr(f"INTERVAL {ttl_ms} MILLISECONDS")

        # mirror the stream's watermark contract: events older than the
        # frontier established by PRIOR batches are late and dropped,
        # exactly as withWatermark drops them before the session
        # aggregation — otherwise the view would "helpfully" merge rows
        # the canonical query lost and the two reads would diverge.
        if self._frontier is not None:
            batch_df = batch_df.where(F.col(ts) >= F.lit(self._frontier))

        # bounded driver read: the batch's event-time maximum (one row)
        mx = batch_df.agg(F.max(ts).alias("m")).collect()[0]["m"]
        if mx is not None:
            cand = mx - datetime.timedelta(milliseconds=self._delay_ms)
            if self._frontier is None or cand > self._frontier:
                self._frontier = cand

        prev = self._snap
        if mx is None:  # empty micro-batch: only the frontier could move
            merged = prev
        else:
            # one weighted event stream: real events (weight 1) plus the
            # held sessions as pseudo-events at their last_ts (weight =
            # n_versions, id/type/value = the session's latest-wins
            # fields). session_window over the union re-merges exactly
            # what the canonical state store would: chains, intra-batch
            # splits, AND out-of-order bridges between held and new
            # sessions (valid because watermark_delay <= ttl pins every
            # admissible event within TTL of a held session's last_ts).
            events = batch_df.select(
                "user_id",
                "event_id",
                "event_type",
                "value",
                F.col(ts).alias("_ts"),
                F.lit(1).cast("bigint").alias("_w"),
            )
            if prev is not None:
                pseudo = prev.select(
                    "user_id",
                    F.col("last_event_id").alias("event_id"),
                    F.col("last_type").alias("event_type"),
                    F.col("last_value").alias("value"),
                    F.col("last_ts").alias("_ts"),
                    F.col("n_versions").alias("_w"),
                )
                events = events.unionByName(pseudo)
            merged = (
                events.groupBy(F.session_window("_ts", gap), "user_id")
                .agg(
                    F.max("event_id").alias("last_event_id"),
                    F.max_by("event_type", "event_id").alias("last_type"),
                    F.max_by("value", "event_id").alias("last_value"),
                    F.sum("_w").cast("bigint").alias("n_versions"),
                    F.max("_ts").alias("last_ts"),
                )
                .select(*LIVE_SNAPSHOT_COLS)
            )

        if merged is None:
            # nothing held and an empty batch: still record the fold so
            # a replay of this batch_id is skipped and a restore resumes
            # from here, not before it.
            self._last_batch_id = batch_id
            if self._snapshot_path is not None:
                self._persist(batch_id)
            return
        # frontier eviction: idle STRICTLY longer than TTL closes a key.
        # The frontier already includes THIS batch's max event time, so
        # evictions land one batch EARLIER than the append query emits
        # them (Spark's watermark lags a batch; availableNow runs a
        # final flush batch, so end-of-stream membership is identical —
        # the view is simply fresher mid-stream).
        if self._frontier is not None:
            lit_frontier = F.lit(self._frontier)
            evicted = merged.where(F.col("last_ts") + ttl < lit_frontier)
            survivors = merged.where(~(F.col("last_ts") + ttl < lit_frontier))
            self._emit_closed(evicted)
        else:
            survivors = merged
        # persist + truncate lineage, then release the previous snapshot
        new_snap = survivors.localCheckpoint(eager=True)
        if self._snap is not None:
            try:
                self._snap.unpersist()
            except Exception:
                pass
        self._snap = new_snap
        self._last_batch_id = batch_id
        if self._snapshot_path is not None:
            self._persist(batch_id)

    def _emit_closed(self, closed: DataFrame) -> None:
        if self._on_closed is not None:
            self._on_closed(
                closed.withColumn("evicted", F.lit(True)).select(
                    "user_id",
                    "last_event_id",
                    "last_type",
                    "last_value",
                    "n_versions",
                    "evicted",
                    "last_ts",
                )
            )

    # -- reads ----------------------------------------------------------------

    def snapshot(self) -> DataFrame | None:
        """Current open sessions (live keys), latest-wins columns +
        evicted=false — the frame the Python spelling's update rows
        described. None before the first non-empty batch. With
        ``watermark_delay_ms`` > 0 a key may transiently carry more
        than one open session (ordered by last_ts) — the same rows the
        canonical query's state store holds before its watermark closes
        the earlier one."""
        if self._snap is None:
            return None
        return self._snap.select(
            "user_id",
            "last_event_id",
            "last_type",
            "last_value",
            "n_versions",
            F.lit(False).alias("evicted"),
            "last_ts",
        )


# ---- transformWithState timer spelling ------------------------------------
#
# The successor API expresses the same TTL eviction with explicit timers:
# every arrival re-registers a processing-time timer at now + TTL, and
# handleExpiredTimer fires when a key's newest timer lapses with no
# newer arrival. Requires the RocksDB state store provider and the
# protobuf wheel (transformWithState's Python state-server protocol);
# tests gate on availability, same honest-gap policy as the Kafka jar.

from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle  # noqa: E402


class CdcTtlProcessor(StatefulProcessor):
    """Latest-wins CDC state with timer-driven idle-key eviction."""

    def __init__(self, ttl_ms: int = CDC_TTL_MS) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState("latest", CDC_STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple[Any, ...], rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        got = self._state.get() if self._state.exists() else None
        last_id, last_type, last_value, n = got if got is not None else (
            -1, None, None, 0,
        )
        for pdf in rows:
            n += len(pdf)
            mx = int(pdf["event_id"].max())
            if mx > last_id:
                row = pdf.loc[pdf["event_id"].idxmax()]
                last_id = mx
                last_type = str(row["event_type"])
                last_value = float(row["value"])
        self._state.update((last_id, last_type, last_value, n))
        # slide the eviction deadline: drop any armed timer, re-arm at
        # now + TTL (listTimers/deleteTimer keep exactly one live timer)
        now = timerValues.getCurrentProcessingTimeInMs()
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        self._handle.registerTimer(now + self._ttl_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "last_event_id": [last_id],
                "last_type": [last_type],
                "last_value": [last_value],
                "n_versions": [n],
                "evicted": [False],
            }
        )

    def handleExpiredTimer(
        self, key: tuple[Any, ...], timerValues: Any, expiredTimerInfo: Any
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        got = self._state.get() if self._state.exists() else None
        if got is None:
            return
        last_id, last_type, last_value, n = got
        self._state.clear()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "last_event_id": [last_id],
                "last_type": [last_type],
                "last_value": [last_value],
                "n_versions": [n],
                "evicted": [True],
            }
        )

    def close(self) -> None:
        pass


def latest_wins_tws(records: DataFrame, ttl_ms: int = CDC_TTL_MS) -> DataFrame:
    """``latest_wins_stateful`` on the transformWithState API (timers)."""
    return (
        records.select("user_id", "event_id", "event_type", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=CdcTtlProcessor(ttl_ms),
            outputStructType=CDC_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="ProcessingTime",
        )
    )
