"""Sequence mining, CDC compaction, skew-safe aggregation, mix quotas,
and cross-engine sketch certification.

These extend the training-data-pipeline tier (SURVEY.md §2.11 north-star)
with operator classes a 100 TB curation stack needs beyond dedup/similarity:

- ``seq_funnel``: staged event-sequence (funnel) mining — the canonical
  "did the user do A then B then C, in order" query. Implemented as three
  cascaded min-aggregations joined on the preceding stage's frontier, so
  each stage is one hash aggregate + one broadcast-able equi-join; no
  window over the full event stream, no per-user collect. Ordering is by
  ``event_id`` (dense, unique, ascending-ish in ts) rather than the raw
  ns timestamp, per FIXTURES.md D3.
- ``cdc_latest_state``: latest-record-wins upsert compaction (the batch
  analog of reading a CDC/changelog topic into a snapshot — reference's
  counter table is exactly such a latest-wins view, DataGenerator.java:548-551).
  One window ranking per key; at scale this is the standard
  shuffle-on-key + in-partition sort, no global sort.
- ``agg_salted_sum``: two-phase salted aggregation — the skew-mitigation
  pattern for hot grouping keys (partial agg on (key, salt), final agg on
  key). Semantically identical to a plain GROUP BY, which is the oracle;
  exactness is guaranteed by DECIMAL arithmetic (D2). At 100 TB the salt
  bounds any single reducer's input to ~1/16 of the hottest key.
- ``text_source_quota``: per-source document quota capping for training
  mixes (keep top-N docs per source by length) — the domain-balancing
  step that precedes mix weighting; windowed top-K per key then re-agg.
- ``agg_sketch_check``: certifies the approximate-sketch tier
  (HyperLogLog distinct counts, KLL/GK percentile) *cross-engine* by
  asserting each engine's sketch lands within tolerance of its own exact
  answer — the sketch values differ between engines by construction, but
  the within-tolerance verdicts are deterministic and hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register_views
from .registry import df_query, sql_query

EV = ("events",)
DOCS = ("documents",)

_FUNNEL_STAGES = ("view", "click", "purchase")


def _funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = register_views(spark, sf_dir, EV)["events"]
    # Stage frontier: first qualifying event_id per user, constrained to
    # come after the previous stage's frontier. Each step is a hash agg
    # over the (filtered) event scan joined to the previous frontier —
    # the join side is |users| rows, broadcast-able at any corpus scale.
    frontier = (
        ev.where(F.col("event_type") == _FUNNEL_STAGES[0])
        .groupBy("user_id")
        .agg(F.min("event_id").alias("first_view"))
    )
    out = frontier
    prev = "first_view"
    for stage, col in (("click", "first_click"), ("purchase", "first_purchase")):
        nxt = (
            ev.where(F.col("event_type") == stage)
            .join(out.select("user_id", prev), "user_id")
            .where(F.col("event_id") > F.col(prev))
            .groupBy("user_id")
            .agg(F.min("event_id").alias(col))
        )
        out = out.join(nxt, "user_id", "left")
        prev = col
    return out.select(
        "user_id", "first_view", "first_click", "first_purchase"
    ).orderBy("user_id")


df_query(
    "seq_funnel",
    _funnel,
    oracle=(
        "WITH v AS (SELECT user_id, MIN(event_id) AS first_view FROM events "
        "  WHERE event_type = 'view' GROUP BY user_id), "
        "c AS (SELECT e.user_id, MIN(e.event_id) AS first_click "
        "  FROM events e JOIN v ON e.user_id = v.user_id "
        "  WHERE e.event_type = 'click' AND e.event_id > v.first_view "
        "  GROUP BY e.user_id), "
        "p AS (SELECT e.user_id, MIN(e.event_id) AS first_purchase "
        "  FROM events e JOIN c ON e.user_id = c.user_id "
        "  WHERE e.event_type = 'purchase' AND e.event_id > c.first_click "
        "  GROUP BY e.user_id) "
        "SELECT v.user_id, v.first_view, c.first_click, p.first_purchase "
        "FROM v LEFT JOIN c ON v.user_id = c.user_id "
        "LEFT JOIN p ON v.user_id = p.user_id ORDER BY v.user_id"
    ),
    tables=EV,
    tags=("sequence", "funnel", "join"),
    doc="staged funnel mining: first view -> first later click -> first "
    "later purchase per user; cascaded min-agg + frontier joins, no "
    "full-stream window",
)


# CDC latest-wins compaction: materialize the current state snapshot from
# an append-only change stream. The reference's counter map IS this view
# (last write per (cluster,topic,partition), DataGenerator.java:548-551).
sql_query(
    "cdc_latest_state",
    "SELECT user_id, event_id AS last_event_id, event_type AS last_type, "
    "value AS last_value, n_versions FROM ("
    "  SELECT user_id, event_id, event_type, value, "
    "    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn, "
    "    CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_versions "
    "  FROM events) t "
    "WHERE rn = 1 ORDER BY user_id",
    tables=EV,
    tags=("cdc", "window", "upsert"),
    doc="latest-record-wins upsert compaction (changelog -> snapshot): "
    "one shuffle on the key, in-partition sort, rank-1 filter",
)


# Batch twin of the streaming tier's DEFAULT CDC path (r9 verdict #1):
# the REGISTERED query calls streaming/cdc.latest_wins_ttl_jvm itself —
# the same session_window + max_by plan the production stream runs (in
# batch, withWatermark is a no-op) — so the JVM default's semantics are
# hash-certified against a gaps-and-islands oracle, not just
# parity-tested against the Python spelling. Boundary semantics pinned
# empirically: two events EXACTLY gap apart merge (Spark treats the
# session interval as closed for merging), so a new session starts only
# when the inter-event gap is STRICTLY > ttl — hence > in the oracle.
def _cdc_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.cdc import latest_wins_ttl_jvm

    ev = register_views(spark, sf_dir, EV)["events"]
    return latest_wins_ttl_jvm(ev, ttl_ms=86_400_000).orderBy(
        "user_id", "session_start"
    )


df_query(
    "cdc_sessionized_compact",
    _cdc_sessionized,
    oracle=(
        "WITH flagged AS ("
        "  SELECT user_id, ts, event_id, event_type, value, "
        "    CASE WHEN ts - LAG(ts) OVER w > INTERVAL '24 hours' "
        "         OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS ns "
        "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "sessions AS ("
        "  SELECT *, SUM(ns) OVER (PARTITION BY user_id "
        "    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid "
        "  FROM flagged) "
        "SELECT user_id, MAX(event_id) AS last_event_id, "
        "  arg_max(event_type, event_id) AS last_type, "
        "  arg_max(value, event_id) AS last_value, "
        "  CAST(COUNT(*) AS BIGINT) AS n_versions, "
        "  TRUE AS evicted, "
        "  MIN(ts) AS session_start, "
        "  MAX(ts) + INTERVAL '24 hours' AS session_end "
        "FROM sessions GROUP BY user_id, sid "
        "ORDER BY user_id, session_start"
    ),
    tables=EV,
    tags=("cdc", "session", "streaming", "upsert"),
    doc="the streaming JVM CDC default's exact plan (session_window + "
    "max_by latest-wins with TTL-gap eviction) run in batch, certified "
    "by a gaps-and-islands oracle — every emitted row is one closed "
    "idle period's final snapshot",
)


def _salted_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = register_views(spark, sf_dir, EV)["events"]
    # Phase 1: partial agg on (key, salt) — caps any single reducer's
    # input at ~1/16 of the hottest key's rows. Phase 2: final agg on the
    # key over <= 16 rows/key. DECIMAL keeps both phases order-immune.
    partial = (
        ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(16)))
        .groupBy("event_type", "salt")
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).alias("psum"),
            F.count("*").alias("pcnt"),
        )
    )
    # D2: sum stays DECIMAL through both phases (order-immune); only the
    # final emitted value is cast to DOUBLE so both engines render it
    # identically (DuckDB fetchdf() degrades DECIMAL to float64).
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("psum").cast("decimal(18,2)").cast("double").alias("total"),
            F.sum("pcnt").cast("bigint").alias("cnt"),
        )
        .orderBy("event_type")
    )


df_query(
    "agg_salted_sum",
    _salted_sum,
    oracle=(
        "SELECT event_type, "
        "CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total, "
        "CAST(COUNT(*) AS BIGINT) AS cnt "
        "FROM events GROUP BY event_type ORDER BY event_type"
    ),
    tables=EV,
    tags=("agg", "skew", "salting"),
    doc="two-phase salted aggregation == plain GROUP BY (the oracle): "
    "skew mitigation with provably identical DECIMAL-exact results",
)


# Per-source quota capping for training mixes: keep the N longest docs per
# source, report what the capped mix looks like. The windowed top-K is the
# same physical shape as S8 truncation (keep latest K per partition).
_QUOTA_N = 50

sql_query(
    "text_source_quota",
    "SELECT source, CAST(COUNT(*) AS BIGINT) AS kept_docs, "
    "CAST(SUM(n_chars) AS BIGINT) AS kept_chars, "
    "MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc FROM ("
    "  SELECT source, doc_id, n_chars, "
    "    ROW_NUMBER() OVER (PARTITION BY source "
    "                       ORDER BY n_chars DESC, doc_id) AS rn "
    "  FROM documents) t "
    f"WHERE rn <= {_QUOTA_N} "
    "GROUP BY source ORDER BY source",
    tables=DOCS,
    tags=("text", "quota", "window"),
    doc=f"per-source quota cap (top {_QUOTA_N} docs by length) + capped-mix "
    "stats: the domain-balancing step before mix weighting",
)


# Sketch-tier certification. approx_count_distinct is HyperLogLog++ in
# Spark and HyperLogLog in DuckDB — raw values differ by construction, so
# the deterministic cross-engine contract is "each engine's sketch is
# within tolerance of its own exact answer". HLL++ default rsd is 5%;
# 20% tolerance is ~4 sigma headroom while still failing on any real
# plumbing bug (wrong column, wrong rows). The median check uses a mixed
# absolute+relative tolerance so it doesn't degenerate to exact equality
# when the true median sits near zero (approx_percentile error is
# rank-based, not value-based).
_SKETCH_SPARK = (
    "WITH ex AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS du, "
    "                   CAST(COUNT(DISTINCT event_id) AS BIGINT) AS de, "
    "                   percentile(value, 0.5) AS mex FROM events), "
    "ap AS (SELECT CAST(approx_count_distinct(user_id) AS BIGINT) AS au, "
    "              CAST(approx_count_distinct(event_id) AS BIGINT) AS ae, "
    "              approx_percentile(value, 0.5, 10000) AS map FROM events) "
    "SELECT CAST(ABS(au - du) <= 0.20 * du AS INT) AS users_hll_ok, "
    "       CAST(ABS(ae - de) <= 0.20 * de AS INT) AS events_hll_ok, "
    "       CAST(ABS(map - mex) <= GREATEST(0.05 * ABS(mex), 0.01) AS INT) AS median_sketch_ok "
    "FROM ex CROSS JOIN ap"
)

_SKETCH_DUCK = (
    "WITH ex AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS du, "
    "                   CAST(COUNT(DISTINCT event_id) AS BIGINT) AS de, "
    "                   quantile_cont(value, 0.5) AS mex FROM events), "
    "ap AS (SELECT CAST(approx_count_distinct(user_id) AS BIGINT) AS au, "
    "              CAST(approx_count_distinct(event_id) AS BIGINT) AS ae, "
    "              approx_quantile(value, 0.5) AS map FROM events) "
    "SELECT CAST(ABS(au - du) <= 0.20 * du AS INT) AS users_hll_ok, "
    "       CAST(ABS(ae - de) <= 0.20 * de AS INT) AS events_hll_ok, "
    "       CAST(ABS(map - mex) <= GREATEST(0.05 * ABS(mex), 0.01) AS INT) AS median_sketch_ok "
    "FROM ex CROSS JOIN ap"
)

sql_query(
    "agg_sketch_check",
    _SKETCH_SPARK,
    oracle=_SKETCH_DUCK,
    tables=EV,
    tags=("agg", "sketch", "approx"),
    doc="HLL distinct + percentile sketch certified within-tolerance of "
    "each engine's exact answer; verdict columns are deterministic and "
    "hash-match even though raw sketch values differ across engines",
)


# Strict-adjacency pattern matching (the MATCH_RECOGNIZE analog that
# plain SQL can express portably): find view -> click -> purchase runs in
# three CONSECUTIVE events of one user, ordered by event_id. Unlike
# seq_funnel (first-ever stages, any gaps) this is the tight-sequence
# variant — one window sort per user, two lead() columns, zero joins.
sql_query(
    "seq_adjacent_pattern",
    "SELECT user_id, event_id AS start_event, "
    "next_id AS click_event, next2_id AS purchase_event FROM ("
    "  SELECT user_id, event_id, event_type, "
    "    LEAD(event_type, 1) OVER w AS next_type, "
    "    LEAD(event_id, 1) OVER w AS next_id, "
    "    LEAD(event_type, 2) OVER w AS next2_type, "
    "    LEAD(event_id, 2) OVER w AS next2_id "
    "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)) t "
    "WHERE event_type = 'view' AND next_type = 'click' "
    "  AND next2_type = 'purchase' "
    "ORDER BY user_id, start_event",
    tables=EV,
    tags=("sequence", "pattern", "window"),
    doc="strict-adjacency pattern match (view,click,purchase in 3 "
    "consecutive events per user): lead()-based MATCH_RECOGNIZE analog, "
    "zero joins",
)


# Longest same-type streak per user — the gaps-and-islands kernel as a
# user-facing query (dedup_substring_spans uses the same trick inside
# the span merge): island id = row_number difference between the global
# per-user sequence and the per-(user, type) sequence, constant within
# each run of consecutive same-type events; two window ranks over ONE
# shuffle on user_id, then a double aggregate.
sql_query(
    "seq_longest_streak",
    "SELECT user_id, event_type, "
    "CAST(MAX(streak) AS BIGINT) AS longest_streak FROM ("
    "  SELECT user_id, event_type, COUNT(*) AS streak FROM ("
    "    SELECT user_id, event_type, "
    "      ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) "
    "      - ROW_NUMBER() OVER (PARTITION BY user_id, event_type "
    "                           ORDER BY event_id) AS island "
    "    FROM events) t "
    "  GROUP BY user_id, event_type, island) runs "
    "GROUP BY user_id, event_type ORDER BY user_id, event_type",
    tables=EV,
    tags=("sequence", "window", "streak"),
    doc="longest run of consecutive same-type events per user "
    "(gaps-and-islands via the two-rank difference): engagement-streak "
    "analytics, one shuffle on the user key",
)


def _conv_latency_sql(diff_min: str, idiv: str) -> str:
    # view -> purchase latency distribution: first view / first later
    # purchase per user (the funnel frontier), latency in whole minutes,
    # then exact p50/p90 over the DISTINCT-latency CDF — same
    # no-full-sort percentile shape as agg_percentiles_exact.
    return (
        "WITH v AS (SELECT user_id, MIN(ts) AS vts FROM events "
        "  WHERE event_type = 'view' GROUP BY user_id), "
        "p AS (SELECT e.user_id, MIN(e.ts) AS pts FROM events e "
        "  JOIN v ON e.user_id = v.user_id "
        "  WHERE e.event_type = 'purchase' AND e.ts >= v.vts "
        "  GROUP BY e.user_id), "
        f"lat AS (SELECT {diff_min} AS m FROM v JOIN p "
        "  ON v.user_id = p.user_id), "
        "cd AS (SELECT m, COUNT(*) AS c FROM lat GROUP BY m), "
        "r AS (SELECT m, SUM(c) OVER (ORDER BY m) AS cum, "
        "  SUM(c) OVER () AS n FROM cd) "
        "SELECT CAST(MAX(n) AS BIGINT) AS n_converters, "
        "CAST(MIN(CASE WHEN cum * 100 >= 50 * n THEN m END) AS BIGINT) "
        "  AS p50_minutes, "
        "CAST(MIN(CASE WHEN cum * 100 >= 90 * n THEN m END) AS BIGINT) "
        "  AS p90_minutes "
        "FROM r"
    )


sql_query(
    "seq_conversion_latency",
    _conv_latency_sql(
        "CAST((unix_micros(p.pts) - unix_micros(v.vts)) DIV 60000000 AS BIGINT)",
        "DIV",
    ),
    oracle=_conv_latency_sql(
        "CAST((epoch_us(p.pts) - epoch_us(v.vts)) // 60000000 AS BIGINT)",
        "//",
    ),
    tables=EV,
    tags=("sequence", "funnel", "percentile"),
    doc="view->purchase conversion latency p50/p90 in whole minutes "
    "over the distinct-latency CDF (no full-stream sort) — the "
    "time-to-convert distribution behind the funnel",
)


def _gini_sql(idiv: str) -> str:
    # Gini of per-user event counts via the rank formula
    # G = (2*sum(r*x) - (n+1)*sum(x)) / (n*sum(x)), permille-floored —
    # activity concentration (0 = egalitarian, ->1000 = one whale).
    # Ordering ties broken by user_id keeps the rank sum deterministic
    # (the formula is tie-invariant for equal x, but determinism is the
    # repo contract). One hash agg + one bounded sort over |users| rows.
    return (
        "WITH ux AS (SELECT user_id, COUNT(*) AS x FROM events "
        "  GROUP BY user_id), "
        "rk AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x, user_id) AS r "
        "  FROM ux), "
        "s AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(r * x) AS srx FROM rk) "
        "SELECT CAST(n AS BIGINT) AS n_users, CAST(sx AS BIGINT) AS n_events, "
        f"CAST((2 * srx - (n + 1) * sx) * 1000 {idiv} (n * sx) AS BIGINT) "
        "  AS gini_permille "
        "FROM s"
    )


sql_query(
    "agg_gini_activity",
    _gini_sql("DIV"),
    oracle=_gini_sql("//"),
    tables=EV,
    tags=("agg", "telemetry", "inequality"),
    doc="Gini coefficient (permille) of per-user event-count "
    "concentration via the rank formula — the whale-dominance gauge "
    "next to agg_key_skew's hottest-key permille",
)


# ---- multi-touch attribution ------------------------------------------------
# The marketing-analytics closure of the sequence tier: every purchase
# credits the click/view touches in its trailing 24 h window under three
# standard models - last-touch (full credit to the latest touch),
# first-touch, and linear (floor-even split, remainder to the last touch
# so every model conserves total cents exactly - the cross-model
# conservation is asserted in test_sequences_attribution). Touchless
# purchases credit the 'direct' channel. Join shape: per-user equi-join
# bounds the range probe (the banded form of join_range_bands applies
# unchanged at 100 TB); two window ranks + one hash agg after it.


def _attribution_sql(idiv: str, interval: str) -> str:
    return (
        "WITH p AS (SELECT user_id, ts, event_id, "
        "  CAST(FLOOR(value * 100) AS BIGINT) AS v FROM events "
        "  WHERE event_type = 'purchase'), "
        "t AS (SELECT user_id, ts, event_id, event_type FROM events "
        "  WHERE event_type IN ('click', 'view')), "
        "tw AS (SELECT p.event_id AS pid, p.v, t.event_type, t.ts, "
        "  t.event_id AS tid FROM p JOIN t ON p.user_id = t.user_id "
        f"  AND t.ts < p.ts AND t.ts >= p.ts - {interval}), "
        "ranked AS (SELECT pid, v, event_type, "
        "  ROW_NUMBER() OVER (PARTITION BY pid ORDER BY ts DESC, tid DESC) "
        "    AS rl, "
        "  ROW_NUMBER() OVER (PARTITION BY pid ORDER BY ts ASC, tid ASC) "
        "    AS rf, "
        "  COUNT(*) OVER (PARTITION BY pid) AS n FROM tw), "
        "credit AS (SELECT event_type, "
        "  CASE WHEN rl = 1 THEN v ELSE 0 END AS last_c, "
        "  CASE WHEN rf = 1 THEN v ELSE 0 END AS first_c, "
        f"  v {idiv} n + CASE WHEN rl = 1 THEN v - n * (v {idiv} n) "
        "    ELSE 0 END AS lin_c, "
        "  CASE WHEN rl = 1 THEN 1 ELSE 0 END AS won FROM ranked), "
        "direct AS (SELECT 'direct' AS event_type, v AS last_c, "
        "  v AS first_c, v AS lin_c, 1 AS won FROM p "
        "  WHERE NOT EXISTS (SELECT 1 FROM tw WHERE tw.pid = p.event_id)) "
        "SELECT event_type AS channel, "
        "CAST(SUM(last_c) AS BIGINT) AS last_touch_cents, "
        "CAST(SUM(first_c) AS BIGINT) AS first_touch_cents, "
        "CAST(SUM(lin_c) AS BIGINT) AS linear_cents, "
        "CAST(SUM(won) AS BIGINT) AS n_last_wins "
        "FROM (SELECT * FROM credit UNION ALL SELECT * FROM direct) u "
        "GROUP BY event_type ORDER BY channel"
    )


sql_query(
    "seq_attribution",
    _attribution_sql("DIV", "INTERVAL 24 HOUR"),
    oracle=_attribution_sql("//", "INTERVAL 24 HOUR"),
    tables=EV,
    tags=("sequence", "attribution", "asof"),
    doc="multi-touch attribution over the trailing 24 h touch window: "
    "last-touch / first-touch / linear credit per channel in exact "
    "integer cents (floor split, remainder to the last touch - every "
    "model conserves total purchase cents), touchless purchases -> "
    "'direct'",
)


# Full first-order Markov transition matrix over per-user event streams
# (the generative companion of seq_adjacent_pattern's fixed 3-pattern):
# every (src -> dst) adjacent-event pair with its count and row-normalized
# permille probability — the behavior-model fit a synthetic-data generator
# or a next-event baseline trains on. One LEAD window per user (state is
# partition-bounded by per-user history), one pair groupBy; the matrix is
# |event_types|^2 rows no matter the corpus size.
sql_query(
    "seq_markov_transitions",
    "WITH nx AS (SELECT user_id, event_type AS src, "
    "            LEAD(event_type) OVER (PARTITION BY user_id "
    "            ORDER BY event_id) AS dst FROM events), "
    "p AS (SELECT src, dst, COUNT(*) AS n FROM nx "
    "      WHERE dst IS NOT NULL GROUP BY src, dst), "
    "t AS (SELECT src, SUM(n) AS tot FROM p GROUP BY src) "
    "SELECT p.src, p.dst, CAST(p.n AS BIGINT) AS n, "
    "CAST(p.n * 1000 DIV t.tot AS BIGINT) AS p_permille "
    "FROM p JOIN t ON p.src = t.src ORDER BY p.src, p.dst",
    oracle=(
        "WITH nx AS (SELECT user_id, event_type AS src, "
        "            LEAD(event_type) OVER (PARTITION BY user_id "
        "            ORDER BY event_id) AS dst FROM events), "
        "p AS (SELECT src, dst, COUNT(*) AS n FROM nx "
        "      WHERE dst IS NOT NULL GROUP BY src, dst), "
        "t AS (SELECT src, SUM(n) AS tot FROM p GROUP BY src) "
        "SELECT p.src, p.dst, CAST(p.n AS BIGINT) AS n, "
        "CAST(p.n * 1000 // t.tot AS BIGINT) AS p_permille "
        "FROM p JOIN t ON p.src = t.src ORDER BY p.src, p.dst"
    ),
    tables=EV,
    tags=("sequence", "markov", "window"),
    doc="first-order Markov transition matrix per user-stream adjacency: "
    "(src, dst, count, row-normalized permille) - constant-width output, "
    "one window + one groupBy",
)
