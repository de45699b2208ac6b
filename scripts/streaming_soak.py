"""Streaming long-run soak: bounded-state + flat-latency evidence.

The streaming tier is parity-certified per micro-batch (tests/), but the
bounded-state claims (streaming/cdc.py TTL eviction, dedup_stream.py
partition-pruned index probes) had never run for more than a few batches
(VERDICT r7 #4). This soak drives both for a sustained run and writes
SOAK.json next to the bench artifacts:

1. ``latest_wins_stateful`` (applyInPandasWithState, processing-time TTL)
   against a rate source with a CONTINUOUSLY GROWING key space
   (user_id = value DIV keys-churn) — the adversarial shape for state:
   without eviction, state rows grow linearly forever; with the TTL the
   store must plateau at ~(new keys/sec x TTL). Sampled every trigger via
   StreamingQueryProgress: numRowsTotal (state store size) and
   processedRowsPerSecond. Gates: state plateaus (last third <= 1.25x
   middle third) and throughput holds (last third >= 0.7x middle third).

2. ``index_probe_dedup_stream`` round-driven: each round lands a fresh
   parquet file of generator documents (scale_probe.gen_documents with a
   sliding id range, so ~families straddle round boundaries and the
   cross-batch index has real dups to catch) and runs one availableNow
   pass. The per-round wall time must stay FLAT as the persisted corpus
   and index grow — the partition-pruned probe reads only the incoming
   batch's buckets, so round N's cost must not scale with rounds 1..N-1.
   Gates: late-round median <= 1.5x early-round median, and the corpus
   holds fewer rows than were fed (cross-round dups were dropped).

3. (r8 verdict #6) a RATE SEARCH runs first: short stepped-rate probes
   (5k -> 200k rows/s) measure sustained processedRowsPerSecond vs the
   offered rate; the knee = the highest rate the stateful operator keeps
   up with (sustained >= 0.9x offered, no growing backlog). The main CDC
   soak then runs AT that measured rate instead of a token 2k rows/s —
   SOAK.json records both the per-rate ladder and the plateau behaviour
   at the knee.

Runtime: ~rate ladder (~4 min) + SOAK_SECS + ~INGEST_ROUNDS x ~1.5 s
(defaults ~15 min). Smoke mode (SPARK_GRAFT_SOAK_SMOKE=1) runs seconds
for CI.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SMOKE = os.environ.get("SPARK_GRAFT_SOAK_SMOKE") == "1"
SOAK_SECS = int(os.environ.get("SPARK_GRAFT_SOAK_SECS", "20" if SMOKE else "600"))
INGEST_ROUNDS = int(
    os.environ.get("SPARK_GRAFT_SOAK_ROUNDS", "4" if SMOKE else "100")
)
DOCS_PER_ROUND = 40 if SMOKE else 200
TTL_MS = 5_000 if SMOKE else 30_000
# fallback rate if the ladder finds nothing sustainable (never expected)
ROWS_PER_SEC = 500 if SMOKE else 2_000
# stepped-rate ladder for the knee search (r8 verdict #6): the generator
# feeds ~478k rec/s, so the ceiling that matters is the stateful
# operator's, not the source's. Measured on local[32]: every rung through
# 800k sustains (746k at 93% of offered); at 1.6M and 3.2M offered the
# operator saturates at ~880-900k processed rows/s — the knee. The
# ladder ends one rung past it so a full run terminates AT the knee.
RATE_LADDER = (
    [500, 2_000]
    if SMOKE
    else [5_000, 20_000, 50_000, 100_000, 200_000, 400_000, 800_000, 1_600_000]
)
RATE_PROBE_SECS = 8 if SMOKE else 45
KEY_CHURN = 100  # a new user_id every KEY_CHURN events -> unbounded keys
OUT_PATH = os.environ.get(
    "SPARK_GRAFT_SOAK_OUT",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "SOAK.json"),
)
WORK_DIR = os.environ.get("SPARK_GRAFT_SOAK_DIR", "/tmp/streaming_soak")


def _cdc_source(spark, rows_per_sec: int):
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_sec))
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            F.expr(f"value DIV {KEY_CHURN}").alias("user_id"),
            F.col("value").alias("event_id"),
            F.element_at(
                F.expr("array('view','click','purchase')"),
                (F.pmod("value", F.lit(3)) + 1).cast("int"),
            ).alias("event_type"),
            (F.pmod("value", F.lit(1000)) / 10.0).alias("value"),
        )
    )


# JVM comparison ladder: same keyed-state shape (window+key count with a
# watermark) but entirely JVM-side — no Arrow transfer, no Python state
# kernel. The gap between this ceiling and the Python operator's is the
# measured cost of Python state at scale: the deployment guidance is
# "keep hot-path state JVM-side when the semantics allow it".
JVM_RATE_LADDER = (
    [2_000] if SMOKE else [200_000, 800_000, 3_200_000, 12_800_000, 25_600_000]
)

# The DEFAULT CDC path ladder (r9 verdict #1): cdc_compact's event-time
# session-window spelling — full latest-wins semantics (max_by snapshot +
# TTL eviction), entirely JVM state. The gate demands >= 5 M rows/s
# sustained, i.e. the default path must beat the Python-state ceiling by
# the margin the r9 soak measured as available.
JVM_CDC_RATE_LADDER = (
    [2_000]
    if SMOKE
    else [1_000_000, 2_500_000, 5_000_000, 10_000_000, 20_000_000]
)
JVM_CDC_TARGET = 5_000_000


def _jvm_stateful(src):
    return (
        src.withWatermark("ts", "5 seconds")
        .groupBy(F.window("ts", "5 seconds"), "user_id")
        .count()
    )


def find_max_rate(spark, op: str = "python") -> dict:
    """Stepped-rate ladder: run a stateful operator briefly at each
    offered rate and measure the SUSTAINED processedRowsPerSecond (last
    2/3 of samples). A rate is sustainable when sustained >= 0.9x offered
    — beyond the knee the state operator falls behind and batches queue.
    ``op="python"`` drives the applyInPandasWithState CDC kernel;
    ``op="jvm"`` drives a watermarked window+key count (pure JVM state).
    Returns the ladder and the highest sustainable rate."""
    import shutil

    from console_datagen_spark.streaming.cdc import (
        latest_wins_stateful,
        latest_wins_ttl_jvm,
    )

    rates = {
        "python": RATE_LADDER,
        "jvm": JVM_RATE_LADDER,
        "jvm_cdc": JVM_CDC_RATE_LADDER,
    }[op]
    ladder = []
    best = None
    for rate in rates:
        ckpt = f"{WORK_DIR}/rate_probe_ckpt_{op}_{rate}"
        shutil.rmtree(ckpt, ignore_errors=True)
        if op == "python":
            plan = latest_wins_stateful(_cdc_source(spark, rate), ttl_ms=TTL_MS)
        elif op == "jvm_cdc":
            # the default cdc_compact path: identical source shape to the
            # Python rung so the two ladders measure the same semantics
            plan = latest_wins_ttl_jvm(
                _cdc_source(spark, rate),
                ttl_ms=TTL_MS,
                watermark_delay="2 seconds",
            )
        else:
            plan = _jvm_stateful(
                spark.readStream.format("rate")
                .option("rowsPerSecond", str(rate))
                .load()
                .select(
                    F.col("timestamp").alias("ts"),
                    F.expr(f"value DIV {KEY_CHURN}").alias("user_id"),
                )
            )
        # jvm_cdc runs a 1 s trigger: at multi-M rows/s the 250 ms cadence
        # spends its budget on per-batch state-store commits (32 partitions
        # x 4 commit cycles/s of session-state delta files) — measured
        # 4.5M sustained at 250 ms vs 5.1M at 1 s on the 5M rung. The
        # latency cost (1 s batches) is the standard throughput trade for
        # a compaction path; the Python ladder keeps 250 ms so its knee
        # remains comparable with r9's.
        trigger = "1 second" if op == "jvm_cdc" else "250 milliseconds"
        q = (
            plan.writeStream.format("noop")
            # session windows emit on close -> append; keyed state ops
            # emit live rows -> update
            .outputMode("append" if op == "jvm_cdc" else "update")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime=trigger)
            .start()
        )
        samples: list[tuple[float, float]] = []
        t_end = time.time() + RATE_PROBE_SECS
        last_batch = -1
        try:
            while time.time() < t_end:
                time.sleep(0.5)
                p = q.lastProgress
                if not p or p["batchId"] == last_batch:
                    continue
                last_batch = p["batchId"]
                samples.append(
                    (
                        p.get("processedRowsPerSecond") or 0.0,
                        p.get("inputRowsPerSecond") or 0.0,
                    )
                )
        finally:
            q.stop()
        # drop startup noise (first batches report 0 or warm-up rates)
        settled = [s for s in samples if s[0] > 0]
        tail = settled[len(settled) // 3 :]
        sustained = round(statistics.mean(s[0] for s in tail), 1) if tail else 0.0
        input_rate = round(statistics.mean(s[1] for s in tail), 1) if tail else 0.0
        # sustainable = keeps up with the offered rate AND is not quietly
        # queueing: a rung lagging input by a STEADY 5-10% grows backlog
        # without bound (the ADVICE r9 case), so the tail must also drain
        # at >= 0.95x the steady-state input rate. That steady rate is
        # min(observed input, offered): the rate source replays backlog
        # after a slow start, so observed inputRowsPerSecond can sit a
        # few % ABOVE offered while the query is catching up — comparing
        # against that transient overdraft flags draining as queueing.
        # The genuine-lag signature (steady input ~= offered, processed
        # 90-95% of it) still fails here at the 0.95 bound.
        no_backlog = bool(tail) and (
            sustained >= 0.95 * min(input_rate, rate) or sustained >= rate
        )
        ok = sustained >= 0.9 * rate and no_backlog
        ladder.append(
            {
                "offered": rate,
                "sustained": sustained,
                "input_rate": input_rate,
                "no_backlog": no_backlog,
                "sustainable": ok,
            }
        )
        print(
            f"# rate probe [{op}] {rate}: sustained={sustained} "
            f"({'OK' if ok else 'KNEE'})",
            flush=True,
        )
        if ok:
            best = rate
        else:
            break  # past the knee; higher rates only queue more
    return {
        "ladder": ladder,
        "op": op,
        "max_sustainable_rate": best or (ROWS_PER_SEC if op == "python" else 0),
        "probe_secs_per_rate": RATE_PROBE_SECS,
    }


def soak_cdc_ttl(spark, rows_per_sec: int = ROWS_PER_SEC) -> dict:
    from console_datagen_spark.streaming.cdc import latest_wins_stateful

    src = _cdc_source(spark, rows_per_sec)
    q = (
        latest_wins_stateful(src, ttl_ms=TTL_MS)
        .writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", f"{WORK_DIR}/cdc_ckpt")
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    samples: list[dict] = []
    t_end = time.time() + SOAK_SECS
    last_batch = -1
    try:
        while time.time() < t_end:
            time.sleep(1.0)
            p = q.lastProgress
            if not p or p["batchId"] == last_batch:
                continue
            last_batch = p["batchId"]
            ops = p.get("stateOperators") or []
            samples.append(
                {
                    "t": round(time.time() - (t_end - SOAK_SECS), 1),
                    "batch_id": p["batchId"],
                    "state_rows": ops[0]["numRowsTotal"] if ops else None,
                    "rows_per_sec": round(p.get("processedRowsPerSecond") or 0, 1),
                }
            )
    finally:
        q.stop()

    thirds = max(len(samples) // 3, 1)
    mid, last = samples[thirds : 2 * thirds], samples[2 * thirds :]
    max_mid = max((s["state_rows"] or 0) for s in mid) if mid else 0
    max_last = max((s["state_rows"] or 0) for s in last) if last else 0
    tp_mid = statistics.mean(s["rows_per_sec"] for s in mid) if mid else 0
    tp_last = statistics.mean(s["rows_per_sec"] for s in last) if last else 0
    keys_seen = (samples[-1]["batch_id"] + 1) if samples else 0  # informational
    return {
        "secs": SOAK_SECS,
        "micro_batches": (samples[-1]["batch_id"] + 1) if samples else 0,
        "ttl_ms": TTL_MS,
        "rows_per_sec_target": rows_per_sec,
        "new_keys_per_sec": rows_per_sec / KEY_CHURN,
        "expected_plateau_keys": rows_per_sec / KEY_CHURN * TTL_MS / 1000,
        "state_rows_max_mid_third": max_mid,
        "state_rows_max_last_third": max_last,
        "throughput_mid_third": round(tp_mid, 1),
        "throughput_last_third": round(tp_last, 1),
        "series": samples if SMOKE else samples[:: max(len(samples) // 120, 1)],
        "gates": {
            "state_plateaus": max_last <= max(max_mid * 1.25, 50),
            "throughput_holds": tp_last >= tp_mid * 0.7,
        },
        "_keys_note": keys_seen and "state_rows must sit near the plateau, "
        "not near total keys fed (unbounded without TTL)",
    }


JVM_SOAK_RATE = 2_000 if SMOKE else 5_000_000


def soak_jvm_cdc_default(spark, rows_per_sec: int = JVM_SOAK_RATE) -> dict:
    """Soak the DEFAULT CDC path (cdc_compact -> JVM session windows) at
    its gated 5 M rows/s target for the full soak window: the ladder
    proves the knee, this proves the state store stays BOUNDED at that
    rate (open sessions plateau at ~new_keys/s x (key-lifetime + TTL +
    watermark), closed sessions evicted by the watermark) and throughput
    holds for minutes, not just a 45 s rung."""
    import shutil

    from console_datagen_spark.streaming.cdc import latest_wins_ttl_jvm

    ckpt = f"{WORK_DIR}/jvm_cdc_soak_ckpt"
    shutil.rmtree(ckpt, ignore_errors=True)
    src = _cdc_source(spark, rows_per_sec)
    q = (
        latest_wins_ttl_jvm(src, ttl_ms=TTL_MS, watermark_delay="2 seconds")
        .writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")  # the ladder's measured trade
        .start()
    )
    samples: list[dict] = []
    t_end = time.time() + SOAK_SECS
    last_batch = -1
    try:
        while time.time() < t_end:
            time.sleep(1.0)
            p = q.lastProgress
            if not p or p["batchId"] == last_batch:
                continue
            last_batch = p["batchId"]
            ops = p.get("stateOperators") or []
            samples.append(
                {
                    "t": round(time.time() - (t_end - SOAK_SECS), 1),
                    "batch_id": p["batchId"],
                    "state_rows": ops[0]["numRowsTotal"] if ops else None,
                    "rows_per_sec": round(
                        p.get("processedRowsPerSecond") or 0, 1
                    ),
                }
            )
    finally:
        q.stop()

    thirds = max(len(samples) // 3, 1)
    mid, last = samples[thirds : 2 * thirds], samples[2 * thirds :]
    max_mid = max((s["state_rows"] or 0) for s in mid) if mid else 0
    max_last = max((s["state_rows"] or 0) for s in last) if last else 0
    tp_mid = statistics.mean(s["rows_per_sec"] for s in mid) if mid else 0
    tp_last = statistics.mean(s["rows_per_sec"] for s in last) if last else 0
    key_life_s = KEY_CHURN / rows_per_sec
    return {
        "secs": SOAK_SECS,
        "micro_batches": (samples[-1]["batch_id"] + 1) if samples else 0,
        "ttl_ms": TTL_MS,
        "rows_per_sec_target": rows_per_sec,
        "new_keys_per_sec": rows_per_sec / KEY_CHURN,
        "expected_plateau_sessions": round(
            rows_per_sec / KEY_CHURN * (key_life_s + TTL_MS / 1000 + 2)
        ),
        "state_rows_max_mid_third": max_mid,
        "state_rows_max_last_third": max_last,
        "throughput_mid_third": round(tp_mid, 1),
        "throughput_last_third": round(tp_last, 1),
        "series": samples if SMOKE else samples[:: max(len(samples) // 120, 1)],
        "gates": {
            "state_plateaus": max_last <= max(max_mid * 1.25, 50),
            "throughput_holds": tp_last >= tp_mid * 0.7,
            "sustains_target": tp_last >= 0.9 * rows_per_sec,
        },
    }


LIVE_VIEW_RATE = 2_000 if SMOKE else 1_000_000


def soak_cdc_live_view(spark, rows_per_sec: int = LIVE_VIEW_RATE) -> dict:
    """Measure the CdcLiveView fold (r11: the JVM path's live read).

    The view is a foreachBatch companion — per batch it sessionizes the
    micro-batch, outer-join-merges into the held snapshot, evicts idle
    keys, and localCheckpoints the survivors. That is strictly more
    per-batch work than the append-mode query's incremental state
    update, so its sustainable rate is the SNAPSHOT REFRESH budget, not
    the ingest ceiling: the reference's health read needs a
    seconds-fresh counter map, and this rung records rows/s the fold
    absorbs while the snapshot row count plateaus at the open-session
    bound (same law as the session-window state store)."""
    import shutil

    from console_datagen_spark.streaming.cdc import CdcLiveView

    ckpt = f"{WORK_DIR}/live_view_ckpt"
    shutil.rmtree(ckpt, ignore_errors=True)
    view = CdcLiveView(ttl_ms=TTL_MS, watermark_delay_ms=2_000)
    src = _cdc_source(spark, rows_per_sec)
    q = (
        src.writeStream.foreachBatch(view.update)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    samples: list[dict] = []
    secs = max(SOAK_SECS // 4, 20)  # a rung, not the full soak window
    t_end = time.time() + secs
    last_batch = -1
    try:
        while time.time() < t_end:
            time.sleep(1.0)
            p = q.lastProgress
            if not p or p["batchId"] == last_batch:
                continue
            last_batch = p["batchId"]
            snap = view.snapshot()
            try:
                # bounded read: the snapshot is O(active keys). The fold
                # may swap+unpersist the frame under a concurrent count —
                # skip the sample's row count rather than fail the rung.
                n_snap = snap.count() if snap is not None else 0
            except Exception:
                n_snap = samples[-1]["snapshot_rows"] if samples else 0
            samples.append(
                {
                    "t": round(time.time() - (t_end - secs), 1),
                    "batch_id": p["batchId"],
                    "rows_per_sec": round(
                        p.get("processedRowsPerSecond") or 0, 1
                    ),
                    "snapshot_rows": n_snap,
                }
            )
    finally:
        q.stop()
    thirds = max(len(samples) // 3, 1)
    mid, last = samples[thirds : 2 * thirds], samples[2 * thirds :]
    tp_mid = statistics.mean(s["rows_per_sec"] for s in mid) if mid else 0
    tp_last = statistics.mean(s["rows_per_sec"] for s in last) if last else 0
    snap_mid = max((s["snapshot_rows"] for s in mid), default=0)
    snap_last = max((s["snapshot_rows"] for s in last), default=0)
    key_life_s = KEY_CHURN / rows_per_sec if rows_per_sec else 0
    return {
        "secs": secs,
        "rows_per_sec_target": rows_per_sec,
        "ttl_ms": TTL_MS,
        "expected_plateau_keys": round(
            rows_per_sec / KEY_CHURN * (key_life_s + TTL_MS / 1000 + 2)
        ),
        "throughput_mid_third": round(tp_mid, 1),
        "throughput_last_third": round(tp_last, 1),
        "snapshot_rows_max_mid_third": snap_mid,
        "snapshot_rows_max_last_third": snap_last,
        "series": samples,
        "gates": {
            # absolute floors first: with zero samples (query died on
            # batch 1) the relative gates pass vacuously (0 >= 0)
            "fold_ran": len(samples) > 0,
            "absorbs_target": tp_last >= 0.9 * rows_per_sec,
            "throughput_holds": tp_last >= tp_mid * 0.7,
            "snapshot_plateaus": snap_last <= max(snap_mid * 1.25, 50),
        },
    }


def soak_dedup_ingest(spark) -> dict:
    import shutil

    from scale_probe import gen_documents

    from console_datagen_spark.streaming.dedup_stream import (
        index_probe_dedup_stream,
    )

    root = f"{WORK_DIR}/ingest"
    shutil.rmtree(root, ignore_errors=True)
    src = f"{root}/src"
    os.makedirs(src, exist_ok=True)
    idx, corpus, ckpt = f"{root}/index", f"{root}/corpus", f"{root}/ckpt"
    stage = f"{root}/stage"

    def _n_files(p: str) -> int:
        return sum(
            len([f for f in files if f.endswith(".parquet")])
            for _, _, files in os.walk(p)
        )

    # without this maintenance pass, round latency grows linearly with
    # accumulated per-batch files (measured 3.5 s -> 12.3 s over 100
    # rounds); every-10-rounds keeps the live tail small enough that the
    # per-round cost plateaus
    compact_every = max(INGEST_ROUNDS // 10, 2)
    round_secs: list[float] = []
    compactions: list[dict] = []
    file_series: list[dict] = []
    fed = 0
    for r in range(INGEST_ROUNDS):
        # sliding id window with 25% overlap: docs re-appearing from the
        # overlap are exact/near dups the cross-batch index must drop
        start = r * (DOCS_PER_ROUND * 3 // 4)
        batch = (
            gen_documents(spark, start + DOCS_PER_ROUND)
            .where(F.col("doc_id") >= start)
            .withColumn("doc_id", F.col("doc_id") + 0)  # keep global ids
            .withColumn("ts", F.to_timestamp(F.lit("2024-01-01 00:00:00")))
            .select("doc_id", "text", "ts")
        )
        batch.coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(
            f for f in os.listdir(stage) if f.startswith("part-")
        )
        shutil.move(f"{stage}/{part}", f"{src}/round_{r:05d}.parquet")
        fed += DOCS_PER_ROUND
        t0 = time.perf_counter()
        q = index_probe_dedup_stream(
            spark.readStream.schema("doc_id LONG, text STRING, ts TIMESTAMP")
            .parquet(src),
            idx,
            corpus,
            ckpt,
            n_buckets=64,
        )
        q.awaitTermination()
        round_secs.append(round(time.perf_counter() - t0, 3))
        # the maintenance pass a real deployment schedules: fold old
        # per-batch partitions so store file counts stay bounded
        # (operators/compaction.compact_batch_store) — run between
        # triggers, exactly where an OPTIMIZE job sits
        if (r + 1) % compact_every == 0:
            from console_datagen_spark.operators.compaction import (
                compact_batch_store,
            )

            t0 = time.perf_counter()
            c1 = compact_batch_store(spark, corpus, keep_last=8)
            c2 = compact_batch_store(
                spark, idx, keep_last=8, cluster_cols=["bucket"]
            )
            compactions.append(
                {
                    "after_round": r + 1,
                    "sec": round(time.perf_counter() - t0, 3),
                    "corpus_folded": c1["folded_batches"],
                    "index_folded": c2["folded_batches"],
                }
            )
        if (r + 1) % 10 == 0 or r + 1 == INGEST_ROUNDS:
            file_series.append(
                {
                    "round": r + 1,
                    "corpus_files": _n_files(corpus),
                    "index_files": _n_files(idx),
                }
            )

    corpus_rows = spark.read.parquet(corpus).count()
    # early window: skip warm-up rounds but never slice to empty (the
    # smoke run has only a handful of rounds)
    n = len(round_secs)
    warm = 1 if n < 12 else 5
    early = round_secs[warm : max(warm + 1, n // 3)]
    late = round_secs[-max(n // 5, 2) :]
    med_early = statistics.median(early)
    med_late = statistics.median(late)
    return {
        "rounds": INGEST_ROUNDS,
        "docs_fed": fed,
        "corpus_rows": corpus_rows,
        "dups_dropped": fed - corpus_rows,
        "round_secs_median_early": round(med_early, 3),
        "round_secs_median_late": round(med_late, 3),
        "round_secs": round_secs,
        "compactions": compactions,
        "file_counts": file_series,
        "gates": {
            "round_latency_flat": med_late <= max(med_early * 1.5, 1.0),
            "cross_round_dups_dropped": corpus_rows < fed,
            # compaction keeps store file counts bounded: the final
            # index file count must sit at ~n_buckets + keep_last tail,
            # not ~rounds x buckets
            "store_files_bounded": (
                not file_series
                or file_series[-1]["index_files"]
                <= 64 + (compact_every + 8) * 64
            ),
        },
    }


def main() -> int:
    import shutil

    from console_datagen_spark.session import get_spark

    if os.environ.get("SPARK_GRAFT_SOAK_JVM_SOAK_ONLY") == "1":
        # run only the default-path (JVM CDC) soak and merge into the
        # existing artifact — the ladders and Python soak carry over
        spark = get_spark(
            app_name="console-datagen-spark-soak-jvm",
            extra_conf={"spark.driver.memory": "8g"},
        )
        try:
            with open(OUT_PATH) as f:
                results = json.load(f)
        except (OSError, ValueError):
            results = {"smoke": SMOKE, "gates": {}, "ok": False}
        results.setdefault("gates", {})
        results["jvm_cdc_soak"] = soak_jvm_cdc_default(spark)
        for k, v in results["jvm_cdc_soak"]["gates"].items():
            results["gates"][f"jvmcdc_{k}"] = v
        results["ok"] = bool(results["gates"]) and all(
            results["gates"].values()
        )
        with open(OUT_PATH, "w") as f:
            json.dump(results, f, indent=1)
            f.write("\n")
        print(json.dumps({"jvm_cdc_soak_gates":
                          results["jvm_cdc_soak"]["gates"],
                          "ok": results["ok"], "out": OUT_PATH}, indent=1),
              flush=True)
        spark.stop()
        return 0 if results["ok"] else 1

    if os.environ.get("SPARK_GRAFT_SOAK_LIVE_VIEW_ONLY") == "1":
        # run only the r11 live-view rung and merge into the artifact
        spark = get_spark(
            app_name="console-datagen-spark-soak-liveview",
            extra_conf={"spark.driver.memory": "8g"},
        )
        try:
            with open(OUT_PATH) as f:
                results = json.load(f)
        except (OSError, ValueError):
            results = {"smoke": SMOKE, "gates": {}, "ok": False}
        results.setdefault("gates", {})
        results["cdc_live_view"] = soak_cdc_live_view(spark)
        for k, v in results["cdc_live_view"]["gates"].items():
            results["gates"][f"liveview_{k}"] = v
        results["ok"] = bool(results["gates"]) and all(
            results["gates"].values()
        )
        with open(OUT_PATH, "w") as f:
            json.dump(results, f, indent=1)
            f.write("\n")
        print(json.dumps({"cdc_live_view_gates":
                          results["cdc_live_view"]["gates"],
                          "throughput_last_third":
                          results["cdc_live_view"]["throughput_last_third"],
                          "ok": results["ok"], "out": OUT_PATH}, indent=1),
              flush=True)
        spark.stop()
        return 0 if results["ok"] else 1

    if os.environ.get("SPARK_GRAFT_SOAK_LADDER_ONLY") == "1":
        # re-run just the knee search (e.g. after extending RATE_LADDER)
        # and merge the new ladder into the existing SOAK.json
        spark = get_spark(
            app_name="console-datagen-spark-soak-ladder",
            extra_conf={"spark.driver.memory": "8g"},
        )
        # SPARK_GRAFT_SOAK_OPS selects which ladders to re-run (comma
        # list of python,jvm,jvm_cdc); unlisted ops keep their existing
        # SOAK.json ladder untouched
        ops = [
            o
            for o in os.environ.get(
                "SPARK_GRAFT_SOAK_OPS", "python,jvm,jvm_cdc"
            ).split(",")
            if o
        ]
        try:
            with open(OUT_PATH) as f:
                results = json.load(f)
        except (OSError, ValueError):
            results = {"smoke": SMOKE, "gates": {}, "ok": False}
        key_for = {
            "python": "rate_search",
            "jvm": "rate_search_jvm",
            "jvm_cdc": "rate_search_jvm_cdc",
        }
        for op in ops:
            results[key_for[op]] = find_max_rate(spark, op=op)
        # gate only on ladders present in the artifact: a subset re-run
        # against a fresh OUT_PATH must not KeyError AFTER the expensive
        # measurement and lose the data
        if "rate_search" in results:
            results["gates"]["rate_knee_found"] = (
                results["rate_search"]["max_sustainable_rate"]
                >= RATE_LADDER[0]
            )
        if "rate_search_jvm_cdc" in results:
            results["gates"]["jvm_cdc_default_sustains_target"] = (
                results["rate_search_jvm_cdc"]["max_sustainable_rate"]
                >= (JVM_CDC_RATE_LADDER[0] if SMOKE else JVM_CDC_TARGET)
            )
        # a fresh partial artifact with zero gates is not "ok" — ok means
        # "every gate present passed AND there are gates"
        results["ok"] = bool(results["gates"]) and all(
            results["gates"].values()
        )
        with open(OUT_PATH, "w") as f:
            json.dump(results, f, indent=1)
            f.write("\n")
        print(
            json.dumps(
                {key_for[op]: results[key_for[op]] for op in ops}
                | {"out": OUT_PATH},
                indent=1,
            ),
            flush=True,
        )
        spark.stop()
        return 0

    shutil.rmtree(WORK_DIR, ignore_errors=True)
    spark = get_spark(
        app_name="console-datagen-spark-soak",
        # same local-mode sizing rationale as scripts/scale_probe.py: a
        # sustained run accumulates parquet footers + state + listing
        # metadata that the JVM-default ~1 GB heap cannot absorb
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_SOAK_DRIVER_MEM", "8g"
            )
        },
    )
    rate_search = find_max_rate(spark)
    rate_search_jvm = find_max_rate(spark, op="jvm")
    rate_search_jvm_cdc = find_max_rate(spark, op="jvm_cdc")
    soak_rate = rate_search["max_sustainable_rate"]
    print(f"# soaking at the measured knee: {soak_rate} rows/s", flush=True)
    results = {
        "smoke": SMOKE,
        "rate_search": rate_search,
        "rate_search_jvm": rate_search_jvm,
        "rate_search_jvm_cdc": rate_search_jvm_cdc,
        "cdc_ttl": soak_cdc_ttl(spark, rows_per_sec=soak_rate),
        "jvm_cdc_soak": soak_jvm_cdc_default(spark),
        "cdc_live_view": soak_cdc_live_view(spark),
        "dedup_ingest": soak_dedup_ingest(spark),
    }
    gates = {
        # the ladder must certify a rate well above the r8 token 2k/s —
        # at least the first non-trivial rung (the knee itself is
        # recorded data, not a pass/fail)
        "rate_knee_found": soak_rate >= RATE_LADDER[0],
        # r9 verdict #1: the DEFAULT CDC path (cdc_compact -> JVM session
        # windows) must sustain >= 5 M rows/s — the Python spelling stays
        # as the processing-time fallback, ~800 k rows/s by measurement
        "jvm_cdc_default_sustains_target": (
            rate_search_jvm_cdc["max_sustainable_rate"]
            >= (JVM_CDC_RATE_LADDER[0] if SMOKE else JVM_CDC_TARGET)
        ),
        **{f"cdc_{k}": v for k, v in results["cdc_ttl"]["gates"].items()},
        **{f"jvmcdc_{k}": v for k, v in results["jvm_cdc_soak"]["gates"].items()},
        **{f"liveview_{k}": v
           for k, v in results["cdc_live_view"]["gates"].items()},
        **{f"ingest_{k}": v for k, v in results["dedup_ingest"]["gates"].items()},
    }
    results["gates"] = gates
    results["ok"] = all(gates.values())
    with open(OUT_PATH, "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")
    print(json.dumps({"gates": gates, "out": OUT_PATH}, indent=1), flush=True)
    spark.stop()
    return 0 if results["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
