"""Heavier analytic queries: multi-way joins, pivot, weighted text ranking.

These certify Catalyst behaviors the single-join queries don't reach:
join *reordering* across 3-6 tables (statistics-driven), pivot
aggregation, and windowed ranking over derived weights. Shapes follow the
classic pricing/shipping/local-supplier analytics over the TPC-H-ish
fixture schema (FIXTURES.md §1).
"""

from __future__ import annotations

from .registry import sql_query

# lineitem pricing summary (classic Q1 shape): multi-aggregate with exact
# decimal arithmetic over the largest table
sql_query(
    "q_pricing_summary",
    # sums are computed exactly in DECIMAL, then the *final output* is cast
    # to DOUBLE: the exact decimal fits a double's 53-bit mantissa at these
    # scales, so both engines emit the identical float64 (the canonicalizer
    # hashes Decimal('284019.50') and float 284019.5 differently otherwise)
    "SELECT l_returnflag, l_linestatus, "
    "CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) "
    "     AS DOUBLE) AS sum_qty, "
    "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) "
    "     AS DOUBLE) AS sum_base_price, "
    # scale-4 intermediate: the discount product is exact at scale 4; casting
    # the sum down to scale 2 would round .xx5 ties HALF_UP in Spark but
    # half-even in DuckDB — keep full precision, then one exact float cast
    "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "         (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(20,4)) "
    "     AS DOUBLE) AS sum_disc_price, "
    "COUNT(*) AS count_order "
    "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
    "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    tables=("lineitem",),
    tags=("agg", "decimal"),
    doc="pricing summary: multi-agg with exact decimals over the fact table",
)

# 3-way join + group + top-N (classic Q3 shape)
sql_query(
    "q_shipping_priority",
    "SELECT o_orderkey, "
    "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "         (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(20,4)) "
    "     AS DOUBLE) AS revenue, "
    "CAST(o_orderdate AS DATE) AS odate "
    "FROM customer JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON l_orderkey = o_orderkey "
    "WHERE c_mktsegment = 'BUILDING' "
    "GROUP BY o_orderkey, CAST(o_orderdate AS DATE) "
    "ORDER BY revenue DESC, o_orderkey LIMIT 10",
    tables=("customer", "orders", "lineitem"),
    tags=("join", "topn"),
    doc="3-way join + agg + top-N: Catalyst join-order + TakeOrdered",
)

# 6-way join (classic Q5 shape): the full star traversal
sql_query(
    "q_local_supplier_volume",
    "SELECT n_name, "
    "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "         (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(20,4)) "
    "     AS DOUBLE) AS revenue "
    "FROM customer "
    "JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON l_orderkey = o_orderkey "
    "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey "
    "WHERE r_name = 'EUROPE' "
    "GROUP BY n_name ORDER BY revenue DESC, n_name",
    tables=("customer", "orders", "lineitem", "supplier", "nation", "region"),
    tags=("join",),
    doc="6-way star join: broadcast dims + reordering under AQE",
)

# pivot: per-user event-type count matrix (groupBy().pivot() analog);
# the oracle spells it as portable conditional aggregation
sql_query(
    "agg_pivot_event_types",
    "SELECT user_id, "
    "CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) "
    "AS click, "
    "CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) "
    "AS error, "
    "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) "
    "AS purchase, "
    "CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) "
    "AS signup, "
    "CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) "
    "AS view "
    "FROM events WHERE user_id < 30 GROUP BY user_id ORDER BY user_id",
    tables=("events",),
    tags=("agg", "pivot"),
    doc="pivot matrix via conditional aggregation (df.groupBy().pivot() analog)",
)

# tf-icf weighted term ranking: integer-exact tf*N/df weighting (log-free so
# both engines agree bit-for-bit); top-3 distinctive terms per doc
_TFIDF_CORE = (
    "WITH toks AS (SELECT doc_id, {unnest} AS tok FROM documents), "
    "tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok), "
    "df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok), "
    "nd AS (SELECT COUNT(*) AS n_docs FROM documents), "
    "scored AS (SELECT doc_id, tok, "
    "           CAST(tf * n_docs * 1000 {idiv} df AS BIGINT) AS score "
    "           FROM tf JOIN df USING (tok) CROSS JOIN nd), "
    "ranked AS (SELECT doc_id, tok, score, "
    "           ROW_NUMBER() OVER (PARTITION BY doc_id "
    "                              ORDER BY score DESC, tok) AS rn "
    "           FROM scored) "
    "SELECT doc_id, tok, score, CAST(rn AS INT) AS rn FROM ranked "
    "WHERE rn <= 3 AND doc_id < 100 ORDER BY doc_id, rn"
)

sql_query(
    "text_tfidf_topk",
    _TFIDF_CORE.format(unnest="explode(split(text, ' '))", idiv="DIV"),
    oracle=_TFIDF_CORE.format(unnest="unnest(string_split(text, ' '))", idiv="//"),
    tables=("documents",),
    tags=("text", "tfidf"),
    doc="tf-idf-style distinctive-term ranking (integer-exact tf*N/df weight)",
)

# forecast-revenue scan (classic Q6 shape): tight range predicates that must
# reach the parquet scan as PushedFilters; single global decimal aggregate
sql_query(
    "q_forecast_revenue",
    "SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "         CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(20,4)) "
    "     AS DOUBLE) AS revenue "
    "FROM lineitem "
    "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
    "AND l_discount >= 0.04 AND l_discount <= 0.06 AND l_quantity < 24",
    tables=("lineitem",),
    tags=("agg", "pushdown"),
    doc="Q6 shape: range-predicate pushdown + single decimal aggregate",
)

# order-priority lineitem counts (classic Q12 shape): fact-to-fact join with
# conditional aggregation over the joined dimension attribute
sql_query(
    "q_priority_lineitems",
    "SELECT l_returnflag, "
    "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
    "         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
    "CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
    "         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count "
    "FROM orders JOIN lineitem ON l_orderkey = o_orderkey "
    "GROUP BY l_returnflag ORDER BY l_returnflag",
    tables=("orders", "lineitem"),
    tags=("join", "conditional_agg"),
    doc="Q12 shape: join + priority-conditional counts",
)

# returned-item customer ranking (classic Q10 shape): 3-way join with a
# selective fact predicate, grouped revenue, top-N
sql_query(
    "q_top_customers",
    "SELECT c_custkey, c_name, n_name, "
    "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "         (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(20,4)) "
    "     AS DOUBLE) AS revenue "
    "FROM customer "
    "JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON l_orderkey = o_orderkey "
    "JOIN nation ON c_nationkey = n_nationkey "
    "WHERE l_returnflag = 'R' "
    "GROUP BY c_custkey, c_name, n_name "
    "ORDER BY revenue DESC, c_custkey LIMIT 20",
    tables=("customer", "orders", "lineitem", "nation"),
    tags=("join", "topn"),
    doc="Q10 shape: selective fact predicate + 3-way star join + top-N",
)

# FULL OUTER join (the one outer-join class q9's left join doesn't reach):
# per-day click vs purchase volumes, either side may be absent
sql_query(
    "join_full_outer",
    "SELECT COALESCE(c.d, p.d) AS d, "
    "COALESCE(c.clicks, 0) AS clicks, COALESCE(p.buys, 0) AS buys "
    "FROM (SELECT CAST(ts AS DATE) AS d, COUNT(*) AS clicks FROM events "
    "      WHERE event_type = 'click' AND user_id < 40 GROUP BY 1) c "
    "FULL OUTER JOIN "
    "     (SELECT CAST(ts AS DATE) AS d, COUNT(*) AS buys FROM events "
    "      WHERE event_type = 'purchase' AND user_id < 10 GROUP BY 1) p "
    "ON c.d = p.d ORDER BY d",
    tables=("events",),
    tags=("join", "outer"),
    doc="FULL OUTER join with COALESCE defaults on both absent sides",
)

# correlated LATERAL subquery: per region, the top-2 nations by customer
# count — the decorrelation tier beyond EXISTS/IN (Catalyst rewrites the
# lateral to a ranked join)
sql_query(
    "join_lateral_topk",
    "SELECT r_name, t.n_name, t.n_customers FROM region, "
    "LATERAL (SELECT n_name, COUNT(*) AS n_customers "
    "         FROM nation JOIN customer ON c_nationkey = n_nationkey "
    "         WHERE n_regionkey = r_regionkey "
    "         GROUP BY n_name ORDER BY n_customers DESC, n_name LIMIT 2) t "
    "ORDER BY r_name, t.n_customers DESC, t.n_name",
    tables=("region", "nation", "customer"),
    tags=("join", "lateral"),
    doc="correlated LATERAL top-2-per-group (decorrelated ranked join)",
)

# order-priority checking (classic Q4 shape): EXISTS semi-join + grouped
# priority counts — the semi-join complement to q10's anti-join
sql_query(
    "q_order_priority",
    "SELECT o_orderpriority, COUNT(*) AS n FROM orders o "
    "WHERE EXISTS (SELECT 1 FROM lineitem l "
    "              WHERE l.l_orderkey = o.o_orderkey "
    "              AND l.l_returnflag = 'R') "
    "GROUP BY o_orderpriority ORDER BY o_orderpriority",
    tables=("orders", "lineitem"),
    tags=("join", "semi"),
    doc="Q4 shape: EXISTS semi-join + priority histogram",
)
