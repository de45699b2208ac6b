"""Q1–Q18: the batch relational surface (SURVEY.md §2.11).

Each query certifies the operator rows named in its doc tag. All are pure
Catalyst territory: scans push filters/projection into parquet, joins pick
broadcast for the dim tables, aggregates run partial+final hash agg with
whole-stage codegen. Reference parity citations are in SURVEY.md §2
(reference: streamshub/console-datagen, e.g. DataGenerator.java:537-551 for
the keyed-count analog Q3).

Dialect notes:
- SUM over integer columns is CAST to BIGINT on both sides (DuckDB widens
  to HUGEINT, Spark stays BIGINT).
- Double aggregates go through DECIMAL(18,2) (FIXTURES.md D2).
- ns-precision ``ts`` is only projected at DATE granularity (D3).
"""

from __future__ import annotations

from .registry import sql_query

EV = ("events",)

# Q1 [S2,P1] scan + projection + envelope count
sql_query(
    "q1_scan_count",
    "SELECT event_type, COUNT(*) AS n FROM events "
    "GROUP BY event_type ORDER BY event_type",
    tables=EV,
    tags=("agg", "scan"),
    doc="S2/P1: envelope projection + count (DataGenerator.java:431-438,537-546)",
)

# Q2 [P2,P6] predicate + prefix filter — pushed to the parquet scan
sql_query(
    "q2_prefix_filter",
    "SELECT COUNT(*) AS n FROM events "
    "WHERE event_type LIKE 'c%' AND value >= 50.0",
    tables=EV,
    tags=("filter",),
    doc="P2/P6: prefix + threshold predicates (DataGenerator.java:255,517)",
)

# Q3 [A1] keyed count (recordsConsumed analog)
sql_query(
    "q3_keyed_count",
    "SELECT user_id, event_type, COUNT(*) AS cnt FROM events "
    "GROUP BY user_id, event_type ORDER BY user_id, event_type",
    tables=EV,
    tags=("agg",),
    doc="A1: per-(cluster,topic,partition) counter analog (DataGenerator.java:548-551)",
)

# Q4 [A3,A4] global sum/min/max with exact decimal
sql_query(
    "q4_global_aggs",
    "SELECT CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total, "
    "MIN(CAST(ts AS DATE)) AS first_day, MAX(CAST(ts AS DATE)) AS last_day "
    "FROM events",
    tables=EV,
    tags=("agg",),
    doc="A3/A4: global sum + min/max instant (CounterProgressCheck.java:89-113)",
)

# Q5 [A5] conditional count (count_if analog)
sql_query(
    "q5_conditional_count",
    "SELECT CAST(SUM(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS hot, "
    "COUNT(*) AS total FROM events",
    tables=EV,
    tags=("agg",),
    doc="A5: conditional count (CounterProgressCheck.java:80-88)",
)

# Q6 exact distinct aggregation
sql_query(
    "q6_distinct",
    "SELECT COUNT(DISTINCT user_id) AS users, "
    "COUNT(DISTINCT event_type) AS types FROM events",
    tables=EV,
    tags=("agg", "distinct"),
    doc="§2.5: exact distinct agg (beyond-reference, built-in Catalyst)",
)

# Q7 grouping sets / rollup
sql_query(
    "q7_rollup",
    "SELECT COALESCE(event_type, 'ALL') AS et, COUNT(*) AS n "
    "FROM events GROUP BY ROLLUP(event_type) ORDER BY et",
    tables=EV,
    tags=("agg", "rollup"),
    doc="§2.5: rollup (beyond-reference)",
)

# Q8 [J1,J2] equi inner join — nation is broadcast (25 rows)
sql_query(
    "q8_inner_join",
    # exact decimal sum, final cast to DOUBLE (canonicalizer hashes Decimal
    # vs float differently; the decimal fits float64 exactly at this scale)
    "SELECT n_name, COUNT(*) AS n, "
    "CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) "
    "     AS DOUBLE) AS bal "
    "FROM customer JOIN nation ON c_nationkey = n_nationkey "
    "GROUP BY n_name ORDER BY n_name",
    tables=("customer", "nation"),
    tags=("join", "agg"),
    doc="J1/J2: snapshot equi-join analog (CounterProgressCheck.java:43-46)",
)

# Q9 [J3] left outer join + coalesce default
sql_query(
    "q9_left_join_default",
    "SELECT r_name, COALESCE(cnt, 0) AS cnt FROM region "
    "LEFT JOIN (SELECT n_regionkey, COUNT(*) AS cnt FROM nation "
    "           GROUP BY n_regionkey) x "
    "ON r_regionkey = n_regionkey ORDER BY r_name",
    tables=("region", "nation"),
    tags=("join",),
    doc="J3: left-outer with default (CounterProgressCheck.java:57-59)",
)

# Q10 [P4] anti join via NOT EXISTS
sql_query(
    "q10_anti_join",
    "SELECT COUNT(*) AS n FROM orders o "
    "WHERE NOT EXISTS (SELECT 1 FROM lineitem l "
    "WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')",
    tables=("orders", "lineitem"),
    tags=("join", "anti"),
    doc="P4: banned-key exclusion analog (ClientConfigFactory.java:87-90)",
)

# Q11 [§2.7] sort + limit, deterministic by unique key
sql_query(
    "q11_topn",
    "SELECT o_orderkey, o_totalprice FROM orders "
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    tables=("orders",),
    tags=("sort", "limit"),
    doc="§2.7: global top-N (TakeOrderedAndProject, no full sort)",
)

# Q12 [S8] top-K per key via ranking window (truncation analog)
sql_query(
    "q12_topk_per_key",
    "SELECT user_id, event_id FROM ("
    "  SELECT user_id, event_id, "
    "         ROW_NUMBER() OVER (PARTITION BY user_id "
    "                            ORDER BY ts DESC, event_id DESC) AS rn "
    "  FROM events) t WHERE rn <= 3 ORDER BY user_id, event_id",
    tables=EV,
    tags=("window", "topk"),
    doc="S8: keep-latest-K-per-partition analog (DataGenerator.java:553-575)",
)

# Q13 [W3,G1] time-bucketed counts + the sawtooth rate-law shape
sql_query(
    "q13_time_buckets",
    "SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n, "
    "CAST(10 + 100 * (DAYOFMONTH(CAST(ts AS DATE)) % 5) AS BIGINT) % 1000 "
    "AS rate_like "
    "FROM events GROUP BY CAST(ts AS DATE) ORDER BY day",
    oracle=(
        "SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n, "
        "CAST(10 + 100 * (day(CAST(ts AS DATE)) % 5) AS BIGINT) % 1000 "
        "AS rate_like "
        "FROM events GROUP BY CAST(ts AS DATE) ORDER BY day"
    ),
    tables=EV,
    tags=("window", "time"),
    doc="W3/G1: 10s-bucket rate law analog (DataGenerator.java:458-459)",
)

# Q14 [J1,W2] analytic lag window — decimal-exact delta
sql_query(
    "q14_lag_delta",
    "SELECT user_id, event_id, "
    "CAST(CAST(CAST(value AS DECIMAL(18,2)) - "
    "     LAG(CAST(value AS DECIMAL(18,2)), 1, CAST(0.00 AS DECIMAL(18,2))) "
    "     OVER (PARTITION BY user_id ORDER BY ts, event_id) "
    "     AS DECIMAL(18,2)) AS DOUBLE) AS delta "
    "FROM events ORDER BY user_id, event_id",
    tables=EV,
    tags=("window",),
    doc="J1/W2: snapshot-diff per-key delta (CounterProgressCheck.java:43-77)",
)

# Q15 [A1] running cumulative count frame
sql_query(
    "q15_running_count",
    "SELECT user_id, event_id, "
    "COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_cnt "
    "FROM events ORDER BY user_id, event_id",
    tables=EV,
    tags=("window",),
    doc="A1: running counter analog (DataGenerator.java:548-551)",
)

# Q16 [E1,E2,E3] set ops
sql_query(
    "q16_set_ops",
    "SELECT user_id FROM events WHERE event_type = 'click' "
    "EXCEPT "
    "SELECT user_id FROM events WHERE event_type = 'error' "
    "ORDER BY user_id",
    tables=EV,
    tags=("setop",),
    doc="E1: retry-frontier set difference (DataGenerator.java:297-321)",
)

# Q17 [G6,§2.9] JSON extraction — dialect-split spelling
sql_query(
    "q17_json_extract",
    "SELECT CAST(get_json_object(props, '$.k') AS BIGINT) AS k, COUNT(*) AS n "
    "FROM events GROUP BY get_json_object(props, '$.k') ORDER BY k",
    oracle=(
        "SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, "
        "COUNT(*) AS n "
        "FROM events GROUP BY json_extract_string(props, '$.k') ORDER BY k"
    ),
    tables=EV,
    tags=("json",),
    doc="G6/§2.9: JSON prop extraction (DataGenerator.java:469-503)",
)

# Q18 [§2.9] scalar function battery
sql_query(
    "q18_scalar_battery",
    "SELECT event_id, LOWER(event_type) AS lo, "
    "SUBSTR(event_type, 1, 2) AS pre, "
    "CONCAT_WS('-', event_type, CAST(user_id AS STRING)) AS tag, "
    "CAST(event_id % 7 AS BIGINT) AS pmod_7, "
    "CAST(YEAR(ts) AS INT) AS y, CAST(MONTH(ts) AS INT) AS m "
    "FROM events WHERE event_id < 100 ORDER BY event_id",
    oracle=(
        "SELECT event_id, LOWER(event_type) AS lo, "
        "SUBSTR(event_type, 1, 2) AS pre, "
        "CONCAT_WS('-', event_type, CAST(user_id AS VARCHAR)) AS tag, "
        "CAST(event_id % 7 AS BIGINT) AS pmod_7, "
        "CAST(YEAR(ts) AS INT) AS y, CAST(MONTH(ts) AS INT) AS m "
        "FROM events WHERE event_id < 100 ORDER BY event_id"
    ),
    tables=EV,
    tags=("scalar",),
    doc="§2.9: string/date/math scalar battery (format/lower/mod per SURVEY)",
)


# TPC-H Q13 plan shape: distribution of customers by order count,
# INCLUDING zero-order customers — the left-outer + count + count-of-
# counts histogram (the classic "group by an aggregate" decorrelation).
sql_query(
    "q_order_count_distribution",
    "SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM ("
    "  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count "
    "  FROM customer c LEFT JOIN orders o "
    "  ON c.c_custkey = o.o_custkey AND o.o_orderpriority = '1-URGENT' "
    "  GROUP BY c.c_custkey) t "
    "GROUP BY c_count ORDER BY custdist DESC, c_count DESC",
    tables=("customer", "orders"),
    tags=("relational", "join", "histogram"),
    doc="TPC-H Q13 shape: customers histogrammed by their urgent-order "
    "count incl. zeros — left-outer join + two-level aggregation",
)
