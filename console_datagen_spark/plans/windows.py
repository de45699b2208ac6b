"""Declared window queries (SURVEY §2.6 W1-W3, Q13-Q15 complement).

The Spark side uses the real window operators (window / session_window);
the DuckDB oracle expresses the identical semantics in batch SQL
(date_trunc bucketing; offset-union for sliding; gaps-and-islands for
sessions). Streaming parity for the same operators is asserted in
tests/test_windows_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import register_views
from ..streaming.windows import session_counts, sliding_counts, tumbling_counts
from .registry import df_query

EV = ("events",)


def _tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = register_views(spark, sf_dir, EV)["events"]
    return tumbling_counts(ev, "1 hour", ("event_type",)).orderBy(
        "ws", "event_type"
    )


df_query(
    "win_tumbling_hour",
    _tumbling,
    oracle=(
        "SELECT date_trunc('hour', ts) AS ws, "
        "date_trunc('hour', ts) + INTERVAL '1 hour' AS we, "
        "event_type, COUNT(*) AS n "
        "FROM events GROUP BY 1, 2, 3 ORDER BY ws, event_type"
    ),
    tables=EV,
    tags=("window", "streaming"),
    doc="W3: tumbling 1h windows via window() (streaming-parity-tested)",
)


def _sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = register_views(spark, sf_dir, EV)["events"]
    return sliding_counts(ev, "2 hours", "1 hour").orderBy("ws")


df_query(
    "win_sliding_2h1h",
    _sliding,
    oracle=(
        # each event belongs to the 2 sliding windows starting at
        # hour(ts) and hour(ts)-1h
        "SELECT ws, COUNT(*) AS n FROM ("
        "  SELECT date_trunc('hour', ts) - h * INTERVAL '1 hour' AS ws "
        "  FROM events, (SELECT unnest([0, 1]) AS h)) t "
        "GROUP BY ws ORDER BY ws"
    ),
    tables=EV,
    tags=("window", "streaming"),
    doc="sliding 2h/1h windows via window(duration, slide)",
)


def _session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = register_views(spark, sf_dir, EV)["events"]
    return session_counts(ev, "30 minutes", "user_id").orderBy("user_id", "ss")


df_query(
    "win_session_30m",
    _session,
    oracle=(
        # gaps-and-islands: a new session starts when the gap from the
        # previous event of the same user exceeds 30 minutes
        "WITH flagged AS ("
        "  SELECT user_id, ts, CASE WHEN ts - LAG(ts) OVER w > INTERVAL '30 minutes' "
        "         OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session "
        "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "sessions AS ("
        "  SELECT user_id, ts, SUM(new_session) OVER "
        "         (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid "
        "  FROM flagged) "
        "SELECT user_id, MIN(ts) AS ss, COUNT(*) AS n "
        "FROM sessions GROUP BY user_id, sid ORDER BY user_id, ss"
    ),
    tables=EV,
    tags=("window", "streaming", "session"),
    doc="W2: session windows (30m gap) via session_window(); oracle is gaps-and-islands",
)

from .registry import sql_query  # noqa: E402  (module groups df+sql queries)

# the analytic-function classes q12/q14/q15 don't reach: distribution
# ranks (ntile/percent_rank/cume_dist — rational outputs are exact k/n
# double divisions, identical in both engines) and value-picking
# (first/last/nth_value with an explicit full-partition frame)
sql_query(
    "win_analytic_battery",
    "SELECT user_id, event_id, "
    "CAST(NTILE(4) OVER w AS INT) AS quartile, "
    "CAST(PERCENT_RANK() OVER w AS DOUBLE) AS pr, "
    "CAST(CUME_DIST() OVER w AS DOUBLE) AS cd, "
    "FIRST_VALUE(event_id) OVER w2 AS first_ev, "
    "LAST_VALUE(event_id) OVER w2 AS last_ev, "
    "NTH_VALUE(event_id, 2) OVER w2 AS second_ev, "
    "LEAD(event_id, 1, CAST(-1 AS BIGINT)) OVER w AS next_ev "
    "FROM events WHERE user_id < 8 "
    "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id), "
    "       w2 AS (PARTITION BY user_id ORDER BY ts, event_id "
    "              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) "
    "ORDER BY user_id, event_id",
    tables=EV,
    tags=("window", "analytic"),
    doc="analytic battery: ntile/percent_rank/cume_dist + first/last/nth_value "
    "over explicit frames (§2.7 extension)",
)


def _gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import gapfill_time_grid

    ev = register_views(spark, sf_dir, EV)["events"]
    return gapfill_time_grid(ev, bucket="hour", keys=("event_type",)).orderBy(
        "ws", "event_type"
    )


df_query(
    "win_gapfill_hours",
    _gapfill,
    oracle=(
        "WITH bounds AS (SELECT date_trunc('hour', MIN(ts)) AS lo, "
        "                       date_trunc('hour', MAX(ts)) AS hi FROM events), "
        "hours AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS ws "
        "          FROM bounds), "
        "keys AS (SELECT DISTINCT event_type FROM events), "
        "counts AS (SELECT date_trunc('hour', ts) AS ws, event_type, "
        "           COUNT(*) AS n FROM events GROUP BY 1, 2) "
        "SELECT h.ws, k.event_type, COALESCE(c.n, 0) AS n "
        "FROM hours h CROSS JOIN keys k "
        "LEFT JOIN counts c ON c.ws = h.ws AND c.event_type = k.event_type "
        "ORDER BY h.ws, k.event_type"
    ),
    tables=EV,
    tags=("window", "gapfill"),
    doc="zero-filled hourly grid (hypertable-rollup gap fill; dense sequence "
    "cross key set, left join pre-aggregated counts)",
)

# rolling range-frame window: per-user trailing 1-hour count/sum. The frame
# is defined on integer epoch-microseconds so both engines evaluate the
# identical numeric RANGE predicate (DuckDB's epoch() is fractional DOUBLE,
# epoch_us matches Spark's unix_micros exactly).
_RANGE_FRAME_CORE = (
    "SELECT user_id, event_id, "
    "CAST(COUNT(*) OVER w AS BIGINT) AS cnt_1h, "
    "CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DECIMAL(20,2)) "
    "     AS DOUBLE) AS sum_1h "
    "FROM (SELECT user_id, event_id, value, {epoch_us} AS eus "
    "      FROM events WHERE user_id < 50) t "
    "WINDOW w AS (PARTITION BY user_id ORDER BY eus "
    "             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) "
    "ORDER BY user_id, event_id"
)

sql_query(
    "win_range_frame",
    _RANGE_FRAME_CORE.format(epoch_us="unix_micros(ts)"),
    oracle=_RANGE_FRAME_CORE.format(epoch_us="epoch_us(ts)"),
    tables=EV,
    tags=("window", "range_frame"),
    doc="trailing-1h RANGE frame per user (rolling count + exact decimal sum)",
)


# ratio-to-report: a windowed SUM as the denominator of its own rows —
# the share-of-total window class the analytic battery doesn't cover
# (ntile/percent_rank are rank-based; this is value-based).
sql_query(
    "win_ratio_to_report",
    "SELECT event_type, user_id, CAST(cnt AS BIGINT) AS cnt, "
    "CAST(cnt * 1000 DIV SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) "
    "  AS share_permille "
    "FROM (SELECT event_type, user_id, COUNT(*) AS cnt FROM events "
    "      GROUP BY event_type, user_id) t "
    "ORDER BY event_type, user_id",
    oracle=(
        "SELECT event_type, user_id, CAST(cnt AS BIGINT) AS cnt, "
        "CAST(cnt * 1000 // SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) "
        "  AS share_permille "
        "FROM (SELECT event_type, user_id, COUNT(*) AS cnt FROM events "
        "      GROUP BY event_type, user_id) t "
        "ORDER BY event_type, user_id"
    ),
    tables=("events",),
    tags=("window", "ratio", "agg"),
    doc="ratio-to-report window: each user's permille share of their "
    "event type's total via a partition-SUM denominator — one shuffle, "
    "no self-join",
)
