"""Streaming distribution-drift monitor (the live form of dq_split_drift).

An ingest pipeline wants to know WITHIN the stream when the incoming
value distribution walks away from a reference histogram — a broken
upstream, a schema shift, a new traffic mix. The monitor shares its
histogram/distance definition with the batch query (plans/supervision.py
``dq_split_drift``): 16 equal-width bins on integer cents, permille
frequencies, squared-L2 distance and max per-bin gap, all integers.

Shape: the baseline histogram is a 16-row broadcast frame; each
micro-batch computes its own histogram (one map-side hash agg over the
batch) and joins the baseline — no stream-side state at all, so the
monitor adds zero state-store footprint to whatever job it rides on.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F

N_BINS = 16
BIN_WIDTH_CENTS = 2000

_BIN = (
    f"LEAST(CAST(FLOOR(value * 100) AS BIGINT) DIV {BIN_WIDTH_CENTS}, "
    f"{N_BINS - 1})"
)


def histogram_permille(df: DataFrame) -> DataFrame:
    """(bin, permille) — the shared histogram definition. Bins with no
    rows are absent (the comparison coalesces them to 0)."""
    binned = df.select(F.expr(_BIN).alias("bin"))
    counts = binned.groupBy("bin").agg(F.count("*").alias("c"))
    total = counts.agg(F.sum("c").alias("n"))
    return counts.crossJoin(F.broadcast(total)).select(
        "bin", F.expr("CAST(c * 1000 DIV n AS BIGINT)").alias("permille")
    )


def drift_against(batch_hist: DataFrame, baseline_hist: DataFrame) -> DataFrame:
    """One row: squared-L2 distance + max per-bin gap between two
    permille histograms (absent bins count as 0 on either side).

    Joined through the full 0..N_BINS-1 grid with two LEFT joins —
    broadcast hints are silently dropped on FULL OUTER joins, so the
    grid form is what actually keeps this a broadcast plan per batch."""
    grid = batch_hist.sparkSession.range(N_BINS).select(
        F.col("id").alias("bin")
    )
    a = batch_hist.select("bin", F.col("permille").alias("pa"))
    b = baseline_hist.select("bin", F.col("permille").alias("pb"))
    joined = (
        grid.join(F.broadcast(a), "bin", "left")
        .join(F.broadcast(b), "bin", "left")
        .select(
            F.coalesce("pa", F.lit(0)).alias("pa"),
            F.coalesce("pb", F.lit(0)).alias("pb"),
        )
    )
    return joined.agg(
        F.expr("CAST(SUM((pa - pb) * (pa - pb)) AS BIGINT)").alias("l2_drift"),
        F.expr("CAST(MAX(ABS(pa - pb)) AS BIGINT)").alias(
            "max_bin_gap_permille"
        ),
    )


def drift_monitor(
    stream: DataFrame,
    baseline: DataFrame,
    on_alert: Callable[[int, int, int], None],
    gap_alert_permille: int = 150,
):
    """Attach the monitor to a streaming frame of events.

    ``baseline``: a batch frame of reference events (its histogram is
    computed once and broadcast). ``on_alert(batch_id, l2, max_gap)``
    fires when the batch's max bin gap crosses the threshold. Returns
    the writeStream handle (caller starts/stops it).
    """
    base_hist = histogram_permille(baseline).cache()
    base_hist.count()  # materialize once; every batch reuses it

    def step(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        row = drift_against(histogram_permille(batch_df), base_hist).collect()[0]
        if row.max_bin_gap_permille >= gap_alert_permille:
            on_alert(batch_id, row.l2_drift, row.max_bin_gap_permille)

    return stream.writeStream.foreachBatch(step)
