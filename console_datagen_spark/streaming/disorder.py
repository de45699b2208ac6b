"""Event-time disorder gauge — measures the ``watermark_delay`` argument.

``latest_wins_ttl_jvm`` / ``cdc_compact`` REQUIRE an explicit
``watermark_delay`` on streams (r10 ADVICE: a library default would
silently choose a data-loss tolerance), but that turned the argument
into a guess — callers had no tool to measure their source's actual
disorder (r11 verdict #8). This module is that tool.

The quantity measured is exactly what the watermark mechanism acts on:
Spark sets the watermark to (max event time of all PRIOR batches −
delay) and drops events below it, so an event is lost iff its LATENESS
— running-max event time at its arrival, minus its own event time —
exceeds the delay. Measure the lateness distribution over a sample of
the real source, pick the quantile matching your loss tolerance (max
observed for zero loss), and pass that as ``watermark_delay``.

Two spellings, one definition:

- ``measure_disorder(df, ...)`` — batch: a bounded sample that carries
  an ARRIVAL-ORDER column (an offset, an ingest sequence, a dense id).
  Running max via a window over arrival order; one row of quantiles
  out. For a global arrival order this is a single-reducer sort — run
  it on a sample, or pass ``partition_cols`` (e.g. the Kafka
  partition) to measure per-partition disorder in parallel, which is
  also the sharper bound when the source interleaves ordered shards.
- ``DisorderMonitor`` — streaming: the drift-monitor foreachBatch
  shape (streaming/drift.py) — zero stream state; the driver holds
  one frontier timestamp, each batch contributes one bounded 1-row
  aggregate (lateness vs the PRIOR batches' max — the exact watermark
  rule, including its batch granularity).

The full measure -> configure loop (monitor a sample, pass
``report()['suggested_watermark_delay']`` into ``cdc_compact``, late
events retained; an unmeasured ``'0 seconds'`` guess demonstrably loses
them) is pinned end-to-end in
``tests/test_disorder.py::test_measure_then_configure_cdc_zero_drops``.
Session-window note: the CDC path tolerates lateness up to
delay + session gap (a late event is dropped only once its session END
falls behind the watermark), so the measured delay is conservative by
up to one TTL — safe in the loss direction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_QUANTILES = (0.5, 0.95, 0.99, 0.999)


def _gauge_aggs():
    # built per call: Column construction needs an active SparkSession,
    # so a module-level list would break plain imports
    return [
        F.count("*").alias("n_events"),
        F.sum((F.col("_late_ms") > 0).cast("bigint")).alias("n_late"),
        F.max("_late_ms").alias("max_late_ms"),
        *[
            F.expr(
                f"CAST(approx_percentile(_late_ms, {q}) AS BIGINT)"
            ).alias(f"p{str(q)[2:]}_late_ms")
            for q in _QUANTILES
        ],
    ]


def measure_disorder(
    df: DataFrame,
    ts_col: str = "ts",
    arrival_col: str = "event_id",
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One-row lateness gauge over a bounded sample.

    Lateness per event = running max of ``ts_col`` in ``arrival_col``
    order (within ``partition_cols``, if given) minus the event's own
    ``ts_col``, in milliseconds; in-order events score 0. Returns
    ``n_events, n_late, max_late_ms, p5/p95/p99/p999_late_ms`` — pass
    ``max_late_ms`` (zero loss) or the chosen quantile as
    ``watermark_delay`` (e.g. f"{max_late_ms} milliseconds").
    """
    w = (
        Window.partitionBy(*partition_cols)
        if partition_cols
        else Window.partitionBy()
    ).orderBy(arrival_col).rowsBetween(Window.unboundedPreceding, 0)
    late = df.select(
        (
            (
                F.max(F.col(ts_col)).over(w).cast("double")
                - F.col(ts_col).cast("double")
            )
            * 1000
        )
        .cast("bigint")
        .alias("_late_ms")
    )
    return late.agg(*_gauge_aggs())


class DisorderMonitor:
    """Streaming lateness gauge — attach via
    ``.writeStream.foreachBatch(monitor.update)`` on a SAMPLE of the
    source whose ``watermark_delay`` you need to choose.

    Mirrors the watermark's own granularity: each event's lateness is
    measured against the max event time of all PRIOR batches (the
    frontier the watermark would have been derived from), so
    ``report()['max_late_ms']`` is precisely the smallest delay under
    which the sampled stream would have lost nothing. Intra-batch
    disorder is invisible to the watermark and therefore ignored here
    too. Driver state: one timestamp + one summary row per batch; per
    batch cost: one 1-row aggregate collect (no stream-side state, the
    drift-monitor shape).
    """

    def __init__(self, ts_col: str = "ts") -> None:
        self._ts = ts_col
        self._frontier = None  # max event time over all prior batches
        self._batches: list[dict] = []

    def update(self, batch_df: DataFrame, batch_id: int) -> None:
        ts = self._ts
        if self._frontier is None:
            # first batch: no prior frontier — nothing can be late yet
            late = batch_df.select(F.lit(0).cast("bigint").alias("_late_ms"))
        else:
            late = batch_df.select(
                F.greatest(
                    (
                        (
                            F.lit(self._frontier).cast("double")
                            - F.col(ts).cast("double")
                        )
                        * 1000
                    ).cast("bigint"),
                    F.lit(0).cast("bigint"),
                ).alias("_late_ms")
            )
        row = late.agg(*_gauge_aggs()).collect()[0]
        if row["n_events"]:
            self._batches.append({"batch_id": batch_id, **row.asDict()})
        mx = batch_df.agg(F.max(ts).alias("m")).collect()[0]["m"]
        if mx is not None and (self._frontier is None or mx > self._frontier):
            self._frontier = mx

    def report(self) -> dict:
        """Pooled summary across all observed batches. ``max_late_ms``
        is the zero-loss ``watermark_delay`` for the sampled prefix;
        ``late_permille`` how much of the stream was out of order at
        all. Per-batch rows under ``batches`` for the curious."""
        n = sum(b["n_events"] for b in self._batches)
        n_late = sum(b["n_late"] for b in self._batches)
        mx = max((b["max_late_ms"] or 0) for b in self._batches) if self._batches else 0
        return {
            "n_events": n,
            "n_late": n_late,
            "late_permille": (n_late * 1000 // n) if n else 0,
            "max_late_ms": mx,
            "suggested_watermark_delay": f"{mx} milliseconds",
            "batches": list(self._batches),
        }
