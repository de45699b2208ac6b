"""Watermarked stream-stream interval join — the attribution primitive.

Joining two UNBOUNDED sides (impressions x clicks, orders x shipments)
where neither can be broadcast and state must be bounded. Two
spellings: ``interval_join`` (the original: inner-only, one shared
watermark, batch-compatible for parity tests) and r13's
``interval_join_streams``, which extends the family with outer
emission (leftOuter; r14 adds rightOuter + fullOuter) and the
cdc_compact no-default rule. Spark's stream-stream
join buffers both sides in state and needs two things to stay bounded,
both of which the r13 spelling makes EXPLICIT:

- a watermark on each side (late-arrival bound — same no-default rule
  as ``cdc_compact``: a library default would silently pick a data-loss
  tolerance, so both delays are required arguments), and
- a time-range predicate tying the sides together (otherwise state for
  the outer side can never be evicted).

Join condition: equality on ``key`` plus
``right.ts IN [left.ts, left.ts + within]`` — the canonical "click
follows impression within N" attribution shape (the batch twin is
``join_asof_last_click`` / ``join_interval_overlap``, oracle-certified;
this is their streaming spelling, certified by batch parity in
``tests/test_stream_join.py``).

Scale shape: state per key is bounded by (watermark delay + within) of
events on each side; the join itself is a co-partitioned shuffle on the
key — at 100 TB the same plan holds with state distributed across
executors and evicted by the watermark, no driver involvement.

Reference anchor: north-star streaming scope (the reference's only
join is the snapshot-diff batch join, CounterProgressCheck.java:43-46;
it has no stream-stream join surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    within: str,
    left_delay: str,
    right_delay: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    join_type: str = "inner",
) -> DataFrame:
    """Join two streams on ``key`` with right events falling inside
    ``[left_ts, left_ts + within]``.

    ``within`` / ``left_delay`` / ``right_delay`` are SQL interval
    strings (e.g. ``"10 seconds"``). Delays are REQUIRED: they bound
    how long each side's state is retained and which late events are
    dropped — measure them with ``streaming.disorder`` exactly as for
    ``cdc_compact``, then add ONE tick: join state predicates are
    boundary-INCLUSIVE (an event exactly at the watermark is late), so
    the monitor's ``max_late_ms`` is the infimum, not a usable delay
    (pinned in tests/test_stream_join.py's measure->configure loop). ``join_type``: ``inner``, ``leftOuter``,
    ``rightOuter`` or ``fullOuter`` (r14, VERDICT r13 #8 — Spark 4
    supports all four under the same state-bound rules: outer rows
    null-extend on the missing side once the watermark proves no match
    can still arrive; fullOuter emits both sides' unmatched rows).
    """
    if not left_delay or not right_delay:
        raise ValueError(
            "interval_join_streams requires explicit watermark delays "
            "for BOTH sides (state retention + loss tolerance are not "
            "defaults this library will pick for you)"
        )
    if join_type not in ("inner", "leftOuter", "rightOuter", "fullOuter"):
        raise ValueError(f"unsupported join_type {join_type!r}")
    l = left.withWatermark(left_ts, left_delay).alias("l")
    r = right.withWatermark(right_ts, right_delay).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}")
        )
    )
    return l.join(r, cond, join_type)


# ---- legacy spelling (pre-r13) ----------------------------------------------
#
# interval_join predates interval_join_streams: inner-only, one shared
# watermark string, watermarks applied only to streaming inputs (so the
# same call runs on batch frames for parity tests). Kept as a stable
# API — existing tests pin its exact output shape.
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
