"""Temporal joins Spark lacks as primitives: as-of and binned range joins.

- **as-of join** (``as_of_join``): for each left row, the most recent
  right row with right.ts <= left.ts per key. The naive theta-join
  (l.ts >= r.ts, max per pair) explodes quadratically; the scalable
  pattern is the union-sort trick: tag both sides, union, sort within
  key by (ts, side-priority), and carry the last right value forward
  with ``last_value(..., ignorenulls)`` over an unbounded-preceding
  window — one shuffle on the key, linear in rows.

- **range join** (``range_join_binned``): joining on value BETWEEN lo AND
  hi has no equi key, so Catalyst would nested-loop it (BroadcastNestedLoop
  at best). Binning maps each band to the integer bins it overlaps and
  each probe value to its bin → plain equi-join on bin + exact residual
  filter. Bin width trades replication (bands spanning many bins) against
  join selectivity — pick ~median band width.

Both are certified against DuckDB oracles (plans/temporal_plans.py) and
against their naive theta-join equivalents in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left rows + the latest right row at-or-before each left timestamp.

    ``tiebreak``: right-side column ordering ties on equal timestamps
    (highest wins, matching "latest record" semantics).

    ``direction``: ``"backward"`` (default — latest right at-or-before,
    ties to the HIGHEST tiebreak) or ``"forward"`` (earliest right
    at-or-after, ties to the LOWEST tiebreak — the "next event" join).
    Forward is the same union-sort carry, scanned in reverse timestamp
    order; still one shuffle on the key.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    value_cols = value_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    # all value columns are carried as ONE struct so every asof_* output
    # comes from the same (latest) right row — carrying each column
    # independently with last(ignorenulls) would mix columns from
    # different right rows whenever a value column is NULL
    rv_type = right.select(
        F.struct(*[F.col(c) for c in value_cols]).alias("_rv")
    ).schema["_rv"].dataType
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(rv_type).alias("_rv"),
        (
            F.lit(None).cast(right.schema[tiebreak].dataType)
            if tiebreak
            else F.lit(0)
        ).alias("_tb"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_rv"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("_tb"),
    )
    # right rows sort before left rows at the same _ts (side 0 < 1), so a
    # left row sees same-timestamp right rows as already arrived ("<= ts");
    # forward scans in reverse so the carry holds the EARLIEST at-or-after
    if direction == "backward":
        order = [F.col("_ts").asc(), F.col("_side").asc(), F.col("_tb").asc()]
    else:
        order = [F.col("_ts").desc(), F.col("_side").asc(), F.col("_tb").desc()]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = l_tag.unionByName(r_tag)
    carried = unioned.select(
        "*", F.last("_rv", ignorenulls=True).over(w).alias("_carr")
    ).where(F.col("_side") == 1)
    return carried.select(
        F.col("_l.*"),
        *[F.col(f"_carr.{c}").alias(f"asof_{c}") for c in value_cols],
    )


def with_bin(col: Column, width: int) -> Column:
    return F.floor(col / width).cast("long")


def range_join_binned(
    probe: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_width: int = 50,
) -> DataFrame:
    """probe ⋈ bands ON probe.value BETWEEN lo AND hi (inclusive), as an
    equi-join on overlapping integer bins + exact residual filter."""
    b = bands.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                with_bin(F.col(lo_col), bin_width),
                with_bin(F.col(hi_col), bin_width),
            )
        ),
    )
    p = probe.withColumn("_bin", with_bin(F.col(value_col), bin_width))
    return (
        p.join(b, "_bin")
        .where(F.col(value_col).between(F.col(lo_col), F.col(hi_col)))
        .drop("_bin")
    )


def gapfill_time_grid(
    events: DataFrame,
    bucket: str = "hour",
    keys: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
) -> DataFrame:
    """Zero-filled time-bucket counts (hypertable-rollup gap fill).

    Builds the dense (bucket x key) grid declaratively — a one-row
    min/max aggregate exploded via ``sequence()`` cross-joined with the
    distinct key set — then left-joins the *pre-aggregated* per-bucket
    counts and coalesces absent buckets to 0. The fact table is touched
    by exactly two aggregations (bounds, counts); the grid is tiny
    (buckets x distinct keys) however large the corpus, so the final
    join broadcasts. No driver-side collect anywhere.
    """
    step = {"hour": "INTERVAL 1 HOUR", "day": "INTERVAL 1 DAY"}[bucket]
    b = F.date_trunc(bucket, F.col(ts_col))
    bounds = events.agg(
        F.date_trunc(bucket, F.min(ts_col)).alias("lo"),
        F.date_trunc(bucket, F.max(ts_col)).alias("hi"),
    )
    grid_ts = bounds.select(
        F.explode(F.expr(f"sequence(lo, hi, {step})")).alias("ws")
    )
    grid = grid_ts.crossJoin(events.select(*keys).distinct())
    counts = (
        events.groupBy(b.alias("ws"), *keys).agg(F.count("*").alias("n"))
    )
    return grid.join(counts, ["ws", *keys], "left").select(
        "ws", *keys, F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
