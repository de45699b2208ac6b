"""Point-in-time-correct feature preparation (leakage-safe ML feature tier).

Training-data pipelines join label events ("spines") against feature
changelogs; doing it wrong leaks the future into training rows. This
module certifies the three canonical leakage-safe shapes plus two
sequence analytics a feature store ships alongside them:

- ``cdc_scd2_history``: build the full SCD Type-2 validity-interval
  history from an append-only changelog — the persistent form of the
  reference's latest-wins counter view (DataGenerator.java:548-551 keeps
  only the head; SCD2 keeps every version with [valid_from, valid_to)).
  One shuffle on the key, in-partition sort, two window functions — the
  same physical shape at 100 TB.
- ``join_point_in_time``: the feature-store PIT join — each purchase
  (spine row) picks the feature version valid AT its timestamp, never a
  later one. Spark side runs the scalable union-sort as-of carry
  (operators/temporal.as_of_join — one shuffle, linear); the DuckDB
  oracle spells the same semantics as SCD2 interval containment
  (valid_from <= ts < valid_to), proving as-of == interval-tiling.
- ``feat_target_encode``: smoothed target encoding computed on the
  TRAIN hash-split only and applied to validation rows — the category
  statistic every tabular pipeline wants, with the train/val boundary
  that makes it leakage-free. Integer-cents arithmetic end-to-end so the
  encoding is hash-exact across engines. The per-category stats frame is
  O(|categories|) — a broadcast join at any corpus scale.
- ``seq_cohort_retention``: cohort users by first-active day, count
  distinct active users at each day offset — two hash aggregates plus
  one equi-join against the O(|users|) cohort frontier (broadcast-able).
- ``seq_funnel_windowed``: time-bounded conversion (first click within
  1 h of each view). Unlike seq_funnel (first-ever stages, any gap) the
  window bound is what product funnels actually use. Spark side = forward
  as-of join (earliest click at-or-after each view; linear union-sort
  carry — NOT a per-user view x click product) + gap filter; oracle =
  correlated EXISTS over the same window.

Determinism follows FIXTURES.md D1-D5: integer cents via
``FLOOR(value*100)``, ties broken by ``event_id``, total ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import register_views
from ..functions.hashing import bucket_sql_duck, bucket_sql_spark
from ..operators.temporal import as_of_join
from .registry import df_query, sql_query

EV = ("events",)

# latest-wins dedupe of same-instant changes: one change per (user, ts),
# highest event_id wins (D3), so SCD2 intervals are strictly increasing
# and never zero-length — the precondition for as-of == containment.


def _dim_sql(where: str = "") -> str:
    return (
        "SELECT user_id, ts, event_id, "
        "CAST(FLOOR(value * 100) AS BIGINT) AS cents FROM ("
        "  SELECT user_id, ts, event_id, value, "
        "    ROW_NUMBER() OVER (PARTITION BY user_id, ts "
        "                       ORDER BY event_id DESC) AS rn "
        f"  FROM events{where}) t WHERE rn = 1"
    )


_DIM_SQL = _dim_sql()
# the PIT feature changelog: everything except the spine's event type
_FEAT_DIM_SQL = _dim_sql(" WHERE event_type <> 'purchase'")

sql_query(
    "cdc_scd2_history",
    "SELECT user_id, "
    "CAST(ROW_NUMBER() OVER w AS BIGINT) AS version, "
    "event_id, cents AS value_cents, "
    "ts AS valid_from, "
    "LEAD(ts) OVER w AS valid_to, "
    "CAST(CASE WHEN LEAD(ts) OVER w IS NULL THEN 1 ELSE 0 END AS INT) "
    "AS is_current "
    f"FROM ({_DIM_SQL}) dim "
    "WINDOW w AS (PARTITION BY user_id ORDER BY ts) "
    "ORDER BY user_id, version",
    tables=EV,
    tags=("cdc", "scd2", "window"),
    doc="SCD Type-2 history from the changelog: [valid_from, valid_to) "
    "validity intervals + version numbers per key; one shuffle on the "
    "key, two windows over one in-partition sort",
)


def _pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = register_views(spark, sf_dir, EV)["events"]
    win = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    # the feature changelog excludes the spine's own event type, so a
    # purchase reads a genuinely EARLIER feature version (or NULL when no
    # feature event precedes it — the left-join contract)
    dim = (
        ev.where(F.col("event_type") != "purchase")
        .withColumn("rn", F.row_number().over(win))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "ts",
            F.col("event_id").alias("dim_event_id"),
            F.expr("CAST(FLOOR(value * 100) AS BIGINT)").alias("cents"),
        )
    )
    spine = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    out = as_of_join(
        spine, dim, key="user_id", value_cols=["dim_event_id", "cents"]
    )
    return out.select(
        "user_id",
        "event_id",
        F.col("asof_dim_event_id").alias("feat_event_id"),
        F.col("asof_cents").alias("feat_cents"),
    ).orderBy("user_id", "event_id")


df_query(
    "join_point_in_time",
    _pit,
    oracle=(
        f"WITH dim AS ({_FEAT_DIM_SQL}), "
        "scd AS (SELECT user_id, event_id, cents, ts AS valid_from, "
        "  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to "
        "  FROM dim) "
        "SELECT p.user_id, p.event_id, "
        "s.event_id AS feat_event_id, s.cents AS feat_cents "
        "FROM events p LEFT JOIN scd s ON p.user_id = s.user_id "
        "  AND s.valid_from <= p.ts "
        "  AND (s.valid_to IS NULL OR p.ts < s.valid_to) "
        "WHERE p.event_type = 'purchase' "
        "ORDER BY p.user_id, p.event_id"
    ),
    tables=EV,
    tags=("feature-store", "asof", "pit"),
    doc="point-in-time feature join: each purchase reads the feature "
    "version valid at its ts (no future leakage); Spark = linear "
    "union-sort as-of carry, oracle = SCD2 interval containment — the "
    "hash match proves the two formulations identical",
)


# --- leakage-safe target encoding ------------------------------------------
# Split by stable hash on event_id (the sample_split idiom), fit the
# smoothed category mean on TRAIN only, report it next to the val volume
# it would be applied to. m=100 Laplace smoothing toward the global train
# prior; everything in integer cents so the result is hash-exact.
_EVBUCKET_SPARK = bucket_sql_spark("event_id")
_EVBUCKET_DUCK = bucket_sql_duck("event_id")
_SMOOTH_M = 100


def _target_encode_sql(bucket: str, idiv: str) -> str:
    return (
        "WITH tagged AS (SELECT event_type, "
        "  CAST(FLOOR(value * 100) AS BIGINT) AS cents, "
        f"  CASE WHEN {bucket} < 800 THEN 'train' ELSE 'val' END AS split "
        "  FROM events), "
        # empty-train guard: ANSI DIV 0 throws on the Spark side
        "prior AS (SELECT CASE WHEN COUNT(*) = 0 THEN 0 "
        f"  ELSE SUM(cents) {idiv} COUNT(*) END AS p FROM tagged "
        "  WHERE split = 'train'), "
        "fit AS (SELECT event_type, COUNT(*) AS train_cnt, SUM(cents) AS s "
        "  FROM tagged WHERE split = 'train' GROUP BY event_type) "
        "SELECT f.event_type, CAST(f.train_cnt AS BIGINT) AS train_cnt, "
        f"CAST((f.s + {_SMOOTH_M} * prior.p) {idiv} "
        f"  (f.train_cnt + {_SMOOTH_M}) AS BIGINT) "
        "  AS enc_cents, "
        "CAST(prior.p AS BIGINT) AS prior_cents, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM tagged v "
        " WHERE v.split = 'val' AND v.event_type = f.event_type) AS val_rows "
        "FROM fit f CROSS JOIN prior ORDER BY f.event_type"
    )


sql_query(
    "feat_target_encode",
    _target_encode_sql(_EVBUCKET_SPARK, "DIV"),
    oracle=_target_encode_sql(_EVBUCKET_DUCK, "//"),
    tables=EV,
    tags=("feature-store", "encoding", "sampling"),
    doc=f"leakage-safe target encoding: smoothed (m={_SMOOTH_M}) category "
    "mean fit on the train hash-split only; per-category stats are "
    "O(|categories|) — a broadcast frame at any scale",
)


# --- cohort retention -------------------------------------------------------
_COHORT_BODY = (
    "WITH firstday AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort "
    "  FROM events GROUP BY user_id), "
    "act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events) "
    "SELECT f.cohort, {diff} AS day_offset, "
    "CAST(COUNT(*) AS BIGINT) AS active_users "
    "FROM act a JOIN firstday f ON a.user_id = f.user_id "
    "WHERE {diff} <= 13 "
    "GROUP BY f.cohort, {diff} ORDER BY f.cohort, day_offset"
)

sql_query(
    "seq_cohort_retention",
    _COHORT_BODY.format(diff="CAST(DATEDIFF(a.day, f.cohort) AS BIGINT)"),
    oracle=_COHORT_BODY.format(
        diff="CAST(date_diff('day', f.cohort, a.day) AS BIGINT)"
    ),
    tables=EV,
    tags=("sequence", "cohort", "retention"),
    doc="cohort retention triangle (first-active day x day offset, "
    "distinct active users, offsets 0..13): two hash aggs + one "
    "equi-join on the O(|users|) cohort frontier",
)


def _funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = register_views(spark, sf_dir, EV)["events"]
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    # forward as-of: earliest click at-or-after each view (linear carry);
    # conversion iff that click lands within the 1 h window — identical
    # to EXISTS(click in [ts, ts+1h]) because the earliest qualifying
    # click is in the window iff any is.
    joined = as_of_join(
        views,
        clicks,
        key="user_id",
        value_cols=["ts"],
        tiebreak="event_id",
        direction="forward",
    )
    return (
        joined.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_views"),
            F.sum(
                F.when(
                    F.col("asof_ts") <= F.expr("ts + INTERVAL 1 HOUR"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_conv"),
        )
        .orderBy("user_id")
    )


df_query(
    "seq_funnel_windowed",
    _funnel_windowed,
    oracle=(
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_views, "
        "CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM events c "
        "  WHERE c.user_id = v.user_id AND c.event_type = 'click' "
        "  AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR) "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_conv "
        "FROM events v WHERE v.event_type = 'view' "
        "GROUP BY user_id ORDER BY user_id"
    ),
    tables=EV,
    tags=("sequence", "funnel", "asof"),
    doc="time-bounded funnel: views converted by a click within 1 h, "
    "via forward as-of (linear union-sort carry, no per-user cross "
    "product) — oracle is the correlated-EXISTS spelling",
)


# --- preference-pair construction (RLHF/DPO prep) ---------------------------
# Within each (lang, source) prompt-bucket, pair the highest-quality doc
# (chosen) with the lowest (rejected), quality = distinct-token permille
# (the sample_weighted idiom), and emit only pairs whose quality margin
# clears 100 permille — pairs without a real preference signal train
# nothing. Two window ranks over one shuffle on the bucket key; at
# 100 TB this is the same per-bucket top-1/bottom-1 shape as
# text_source_quota.
_Q_SPARK = (
    "size(array_distinct(split(text, ' '))) * 1000 DIV size(split(text, ' '))"
)
_Q_DUCK = (
    "len(list_distinct(string_split(text, ' '))) * 1000 "
    "// len(string_split(text, ' '))"
)
_PREF_MARGIN = 100


def _pref_pairs_sql(q_expr: str) -> str:
    return (
        "WITH scored AS (SELECT lang, source, doc_id, "
        f"  CAST({q_expr} AS BIGINT) AS q, "
        "  ROW_NUMBER() OVER (PARTITION BY lang, source "
        f"                     ORDER BY CAST({q_expr} AS BIGINT) DESC, doc_id) AS rb, "
        "  ROW_NUMBER() OVER (PARTITION BY lang, source "
        f"                     ORDER BY CAST({q_expr} AS BIGINT) ASC, doc_id) AS rw "
        "  FROM documents) "
        "SELECT b.lang, b.source, "
        "b.doc_id AS chosen_doc, w.doc_id AS rejected_doc, "
        "b.q AS chosen_q, w.q AS rejected_q "
        "FROM scored b JOIN scored w "
        "  ON b.lang = w.lang AND b.source = w.source "
        "WHERE b.rb = 1 AND w.rw = 1 AND b.doc_id <> w.doc_id "
        f"  AND b.q - w.q >= {_PREF_MARGIN} "
        "ORDER BY b.lang, b.source"
    )


sql_query(
    "pipeline_preference_pairs",
    _pref_pairs_sql(_Q_SPARK),
    oracle=_pref_pairs_sql(_Q_DUCK),
    tables=("documents",),
    tags=("pipeline", "preference", "rlhf"),
    doc="preference-pair construction per (lang, source) bucket: "
    f"best-vs-worst quality doc with a >={_PREF_MARGIN} permille margin "
    "gate — the chosen/rejected extraction step of DPO-style data prep",
)


# --- fused feature-matrix materialization -----------------------------------
# The capstone composition: one declarative plan materializes a training
# feature matrix over the purchase spine — (a) the point-in-time value
# feature via the linear as-of carry, (b) cohort age in days, (c) prior
# activity count via a bounded window frame. Three feature families,
# three shuffle keys (user_id twice reused, user_id+sort once) — Catalyst
# fuses the projections; nothing leaks post-spine information.


def _feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = register_views(spark, sf_dir, EV)["events"]
    wprior = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_prior = ev.withColumn(
        "n_prior", F.count("*").over(wprior).cast("bigint")
    )
    spine = with_prior.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "n_prior"
    )
    wdim = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    dim = (
        ev.where(F.col("event_type") != "purchase")
        .withColumn("rn", F.row_number().over(wdim))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "ts",
            F.expr("CAST(FLOOR(value * 100) AS BIGINT)").alias("cents"),
        )
    )
    pit = as_of_join(spine, dim, key="user_id", value_cols=["cents"])
    cohort = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort")
    )
    return (
        pit.join(cohort, "user_id")
        .select(
            "user_id",
            "event_id",
            F.col("asof_cents").alias("feat_cents"),
            F.expr("CAST(DATEDIFF(CAST(ts AS DATE), cohort) AS BIGINT)").alias(
                "cohort_age_days"
            ),
            "n_prior",
        )
        .orderBy("user_id", "event_id")
    )


df_query(
    "pipeline_feature_matrix",
    _feature_matrix,
    oracle=(
        f"WITH dim AS ({_FEAT_DIM_SQL}), "
        "scd AS (SELECT user_id, cents, ts AS valid_from, "
        "  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to "
        "  FROM dim), "
        "firstday AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort "
        "  FROM events GROUP BY user_id), "
        "pr AS (SELECT user_id, event_id, ts, event_type, "
        "  CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY event_id "
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT) "
        "    AS n_prior FROM events) "
        "SELECT p.user_id, p.event_id, s.cents AS feat_cents, "
        "CAST(date_diff('day', f.cohort, CAST(p.ts AS DATE)) AS BIGINT) "
        "  AS cohort_age_days, p.n_prior "
        "FROM pr p "
        "LEFT JOIN scd s ON p.user_id = s.user_id "
        "  AND s.valid_from <= p.ts "
        "  AND (s.valid_to IS NULL OR p.ts < s.valid_to) "
        "JOIN firstday f ON p.user_id = f.user_id "
        "WHERE p.event_type = 'purchase' "
        "ORDER BY p.user_id, p.event_id"
    ),
    tables=EV,
    tags=("feature-store", "pipeline", "asof"),
    doc="fused feature-matrix materialization over the purchase spine: "
    "point-in-time value (as-of carry), cohort age, prior-event count — "
    "one declarative plan, leakage-free by construction",
)
