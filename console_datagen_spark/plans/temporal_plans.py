"""Declared as-of / range join queries (SURVEY §2.4 beyond-reference joins).

The Spark side runs the scalable operators (union-sort as-of; binned
range equi-join); the DuckDB oracle expresses the same semantics in
window/theta-join SQL — certifying that the optimized shapes preserve
exact join semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import register_views
from ..operators.temporal import as_of_join, range_join_binned
from .registry import df_query, sql_query

EV = ("events",)


def _asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = register_views(spark, sf_dir, EV)["events"]
    left = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    right = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    out = as_of_join(
        left,
        right,
        key="user_id",
        value_cols=["event_id"],
        tiebreak="event_id",
    )
    return out.select(
        "user_id",
        "event_id",
        F.col("asof_event_id").alias("last_click_id"),
    ).orderBy("user_id", "event_id")


df_query(
    "join_asof_last_click",
    _asof,
    oracle=(
        # per purchase: the user's latest click at-or-before the purchase ts
        # (ties on ts broken toward the highest click event_id)
        "SELECT p.user_id, p.event_id, "
        "( SELECT c.event_id FROM events c "
        "  WHERE c.user_id = p.user_id AND c.event_type = 'click' "
        "  AND c.ts <= p.ts "
        "  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS last_click_id "
        "FROM events p WHERE p.event_type = 'purchase' "
        "ORDER BY p.user_id, p.event_id"
    ),
    tables=EV,
    tags=("join", "asof"),
    doc="as-of join via union-sort carry-forward (one shuffle, no theta join)",
)


def _range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = register_views(spark, sf_dir, EV)["events"]
    bands = spark.createDataFrame(
        [("tiny", 0, 9), ("low", 10, 49), ("mid", 50, 149), ("high", 150, 999)],
        "band STRING, lo INT, hi INT",
    )
    probe = ev.select(
        "event_id", F.floor(F.col("value")).cast("int").alias("v")
    )
    out = range_join_binned(probe, bands, "v", bin_width=50)
    return (
        out.groupBy("band")
        .agg(F.count("*").alias("n"))
        .orderBy("band")
    )


df_query(
    "join_range_bands",
    _range,
    oracle=(
        "WITH bands(band, lo, hi) AS (VALUES "
        "('tiny', 0, 9), ('low', 10, 49), ('mid', 50, 149), ('high', 150, 999)) "
        "SELECT band, COUNT(*) AS n FROM events e JOIN bands b "
        "ON CAST(FLOOR(e.value) AS INT) BETWEEN b.lo AND b.hi "
        "GROUP BY band ORDER BY band"
    ),
    tables=EV,
    tags=("join", "range"),
    doc="range join via bin equi-join + residual filter (no nested loop)",
)


def _asof_fwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = register_views(spark, sf_dir, EV)["events"]
    left = ev.where(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    right = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    out = as_of_join(
        left,
        right,
        key="user_id",
        value_cols=["event_id"],
        tiebreak="event_id",
        direction="forward",
    )
    return out.select(
        "user_id",
        "event_id",
        F.col("asof_event_id").alias("next_purchase_id"),
    ).orderBy("user_id", "event_id")


df_query(
    "join_asof_next_purchase",
    _asof_fwd,
    oracle=(
        # per click: the user's earliest purchase at-or-after the click ts
        # (ties on ts broken toward the lowest purchase event_id)
        "SELECT c.user_id, c.event_id, "
        "( SELECT p.event_id FROM events p "
        "  WHERE p.user_id = c.user_id AND p.event_type = 'purchase' "
        "  AND p.ts >= c.ts "
        "  ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) AS next_purchase_id "
        "FROM events c WHERE c.event_type = 'click' "
        "ORDER BY c.user_id, c.event_id"
    ),
    tables=EV,
    tags=("join", "asof"),
    doc="forward as-of join (next event at-or-after): reverse-scan union-"
    "sort carry — the conversion-attribution shape, one shuffle, no theta",
)


# ---- interval-overlap join -------------------------------------------------
# The third temporal-join class next to as-of (point reads latest
# interval start) and point-in-band (join_range_bands): INTERVAL x
# INTERVAL overlap. Here: each user's per-day activity span [first, last]
# joined against fixed intra-day campaign windows [06:00, 18:00), overlap
# length reported in whole minutes. The equi key is the DAY bin — the
# binned-interval pattern: plain hash join on the bin plus an exact
# residual overlap predicate, never a nested loop. Everything is integer
# epoch-microseconds (unix_micros / epoch_us), so the overlap arithmetic
# is bit-identical across engines.

_OVERLAP_CORE = (
    "WITH spans AS (SELECT user_id, CAST(ts AS DATE) AS day, "
    "  MIN({epoch_us}) AS s, MAX({epoch_us}) AS e "
    "  FROM events GROUP BY user_id, CAST(ts AS DATE)), "
    "wins AS (SELECT day, "
    "  {day_us} + 21600000000 AS ws, "   # 06:00
    "  {day_us} + 64800000000 AS we "    # 18:00
    "  FROM (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events) d) "
    "SELECT sp.user_id, sp.day, "
    "CAST((LEAST(sp.e, w.we - 1) - GREATEST(sp.s, w.ws)) {idiv} 60000000 AS BIGINT) "
    "  AS overlap_minutes "
    "FROM spans sp JOIN wins w ON sp.day = w.day "
    "WHERE sp.s < w.we AND w.ws <= sp.e "
    "ORDER BY sp.user_id, sp.day"
)


sql_query(
    "join_interval_overlap",
    _OVERLAP_CORE.format(
        epoch_us="unix_micros(ts)",
        day_us="CAST(DATEDIFF(day, DATE '1970-01-01') AS BIGINT) * 86400000000",
        idiv="DIV",
    ),
    oracle=_OVERLAP_CORE.format(
        epoch_us="epoch_us(ts)",
        day_us="CAST(day - DATE '1970-01-01' AS BIGINT) * 86400000000",
        idiv="//",
    ),
    tables=EV,
    tags=("temporal", "interval", "join"),
    doc="interval x interval overlap join (user day-span vs 06:00-18:00 "
    "campaign window) with overlap minutes: equi-join on the day bin + "
    "exact residual predicate, integer epoch-us arithmetic",
)


# ---- tolerance-bounded as-of join ------------------------------------------
# pandas merge_asof's ``tolerance`` in engine form: the carried match is
# dropped when it is STALER than the bound (here 24 h) — the staleness
# contract a feature read usually ships with (a quote from last month is
# not a fill). Same linear union-sort carry; the tolerance is one extra
# residual predicate on the carried timestamp, zero extra shuffles.


def _asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = register_views(spark, sf_dir, EV)["events"]
    left = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    right = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    out = as_of_join(
        left, right, key="user_id", value_cols=["event_id", "ts"],
        tiebreak="event_id",
    )
    fresh = F.col("asof_ts") >= F.expr("ts - INTERVAL 24 HOUR")
    return out.select(
        "user_id",
        "event_id",
        F.when(fresh, F.col("asof_event_id")).alias("last_click_id"),
    ).orderBy("user_id", "event_id")


df_query(
    "join_asof_tolerance",
    _asof_tolerance,
    oracle=(
        "SELECT p.user_id, p.event_id, "
        "( SELECT c.event_id FROM events c "
        "  WHERE c.user_id = p.user_id AND c.event_type = 'click' "
        "  AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 24 HOUR "
        "  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS last_click_id "
        "FROM events p WHERE p.event_type = 'purchase' "
        "ORDER BY p.user_id, p.event_id"
    ),
    tables=EV,
    tags=("temporal", "asof", "tolerance"),
    doc="as-of join with a 24 h staleness tolerance (merge_asof "
    "tolerance analog): stale carries null out via one residual "
    "predicate on the carried ts — no extra shuffle",
)
