"""Watermarked stream-stream interval join (attribution topology).

The reference never joins two live streams (its only join is the
snapshot-diff batch join, CounterProgressCheck.java:43-46), but an
engine claiming its streaming surface at scale needs the canonical
stream-stream shape: attribute each right-stream event (purchase) to a
preceding left-stream event (click) by the same key within a bounded
interval. Spark buffers both sides in the state store and the interval
condition + watermarks bound that state: rows older than
watermark - interval are evicted, so state is O(rate x interval), not
O(stream).

The time-bound predicate MUST be part of the join condition — an
equi-join alone would force unbounded buffering (Spark rejects it in
append mode without watermarks on both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """right rows matched to left rows with l_ts <= r_ts <= l_ts + max_lag.

    Both sides are watermarked; works identically on batch frames (the
    parity tests run the same function on static DataFrames).
    """
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= F.expr(f"{left_ts} + INTERVAL {max_lag}"))
    )
    return lw.join(rw, cond, "inner").select(
        lw[key].alias(key), F.col(left_ts), F.col(right_ts)
    )
