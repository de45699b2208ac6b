"""Round-5 session-3 scale operators.

- ``dedup_substring_spans``: cross-document exact-substring dedup (the
  span-level dedup of Lee et al. 2022, "Deduplicating Training Data
  Makes Language Models Better", arXiv:2107.06499): find every ≥L-token
  run shared verbatim by ≥2 documents and merge overlapping hits into
  maximal per-doc spans — the excision list a span-level deduper feeds
  back into the corpus. Complements document-level MinHash (whole-doc
  near-dups) and dedup_cdc_chunks (content-defined blocks): this is the
  token-exact sliding-window variant, one shingle shuffle + one
  candidate join, then pure gaps-and-islands windows per doc.
- ``q_waiting_suppliers``: the TPC-H Q21 plan shape — join + correlated
  EXISTS + correlated NOT EXISTS on the same fact (the hardest classic
  decorrelation case: Catalyst plans semi + anti joins over lineitem).
  Fixture-adapted: `l_returnflag = 'R'` is the "problem lineitem"
  marker (the fixtures carry no receipt/commit dates).
- ``join_bloom_runtime``: runtime Bloom-filtered join — the engine-level
  pattern behind Spark's runtime row-group/bloom filters: build a tiny
  bitmap over the (filtered) dim join keys, broadcast it, and discard
  fact rows BEFORE the join. Zero added shuffles: the probe is three
  broadcast word-lookups evaluated in the fact's scan stage. The DuckDB
  oracle is the PLAIN join — the hash match certifies the bloom pass
  dropped no qualifying row (no false negatives), while false positives
  are eliminated by the exact join that follows.
- ``agg_quantile_sketch``: mergeable rank-grid quantile sketch
  certification (operators/quantile_sketch.py) — the quantile analog of
  agg_heavy_hitters' Misra–Gries contract.
- ``dedup_components_lss``: large-star/small-star connected components
  (operators/components_lss.py) — O(log n) rounds vs label
  propagation's O(diameter), certified against the SAME recursive-CTE
  oracle as dedup_components (both converge to min-reachable-id labels).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import register_views
from .dedup import (
    _DUCK_PAIRS,
    _DUCK_PAIRS_CAPPED,
    _minhash_pairs_capped_raw,
    _minhash_pairs_raw,
)
from .registry import df_query, sql_query

DOCS = ("documents",)

# ---------------------------------------------------------------- substring
_L = 16  # minimum duplicated run length (tokens)


def _substr_sql(dialect: str) -> str:
    if dialect == "spark":
        split_ = "split(text, ' ')"
        size_ = "size(split(text, ' '))"
        pos = f"explode(sequence(0, n - {_L}))"
        win = f"md5(array_join(slice(toks, p + 1, {_L}), ' '))"
    else:
        split_ = "string_split(text, ' ')"
        size_ = "len(string_split(text, ' '))"
        pos = f"unnest(generate_series(0, n - {_L}))"
        win = f"md5(array_to_string(toks[p + 1 : p + {_L}], ' '))"
    return (
        f"WITH t0 AS (SELECT doc_id, {split_} AS toks, {size_} AS n "
        f"            FROM documents WHERE {size_} >= {_L}), "
        f"s AS (SELECT doc_id, p, {win} AS h "
        f"      FROM (SELECT doc_id, toks, {pos} AS p FROM t0) t1), "
        "d AS (SELECT h FROM s GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2), "
        "hits AS (SELECT s.doc_id, s.p FROM s JOIN d ON s.h = d.h), "
        "fl AS (SELECT doc_id, p, "
        f"       CASE WHEN p - LAG(p) OVER (PARTITION BY doc_id ORDER BY p) > {_L} "
        "            THEN 1 ELSE 0 END AS brk FROM hits), "
        "isl AS (SELECT doc_id, p, "
        "        SUM(brk) OVER (PARTITION BY doc_id ORDER BY p "
        "          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id "
        "        FROM fl) "
        "SELECT doc_id, CAST(span_id AS INT) AS span_id, "
        "CAST(MIN(p) AS INT) AS start_tok, "
        f"CAST(MAX(p) + {_L - 1} AS INT) AS end_tok, "
        f"CAST(MAX(p) - MIN(p) + {_L} AS INT) AS span_tokens "
        "FROM isl GROUP BY doc_id, span_id ORDER BY doc_id, span_id"
    )


sql_query(
    "dedup_substring_spans",
    _substr_sql("spark"),
    oracle=_substr_sql("duck"),
    tables=DOCS,
    tags=("dedup", "substring", "text", "training"),
    doc=f"exact-substring span dedup (Lee et al. 2022): {_L}-token shingle "
    "hashes shared across >=2 docs, overlapping hits merged into maximal "
    "per-doc spans (gaps-and-islands) — the span excision list; one "
    "shingle-hash shuffle + candidate equi-join, per-doc windows",
)


# ----------------------------------------------------------- TPC-H Q21 shape
_Q21 = (
    "SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait "
    "FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey "
    "JOIN orders ON o_orderkey = l1.l_orderkey "
    "WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R' "
    "AND EXISTS (SELECT 1 FROM lineitem l2 "
    "            WHERE l2.l_orderkey = l1.l_orderkey "
    "              AND l2.l_suppkey <> l1.l_suppkey) "
    "AND NOT EXISTS (SELECT 1 FROM lineitem l3 "
    "                WHERE l3.l_orderkey = l1.l_orderkey "
    "                  AND l3.l_suppkey <> l1.l_suppkey "
    "                  AND l3.l_returnflag = 'R') "
    "GROUP BY s_name ORDER BY numwait DESC, s_name"
)

sql_query(
    "q_waiting_suppliers",
    _Q21,
    tables=("supplier", "lineitem", "orders"),
    tags=("join", "semi", "anti", "subquery"),
    doc="TPC-H Q21 shape: sole-blamed-supplier mining via correlated "
    "EXISTS (semi) + NOT EXISTS (anti) on the same fact — the classic "
    "decorrelation stress; returnflag='R' stands in for late receipt",
)


# ------------------------------------------------------ runtime bloom join
_M = 8192  # bloom bits (256 32-bit words — a one-packet broadcast)
_COEFFS = ((3, 7), (5, 38), (7, 131))


def _rf_sql(dialect: str) -> str:
    if dialect == "spark":
        idiv = "DIV"
        shift = lambda b: f"shiftleft(CAST(1 AS BIGINT), CAST({b} AS INT))"  # noqa: E731
        hint3 = "/*+ BROADCAST(w1, w2, w3) */ "
        hintd = "/*+ BROADCAST(dim) */ "
    else:
        idiv = "//"
        shift = lambda b: f"(CAST(1 AS BIGINT) << CAST({b} AS INT))"  # noqa: E731
        hint3 = hintd = ""
    probes = [f"(({a} * l.l_partkey + {b}) % {_M})" for a, b in _COEFFS]
    dim_pos = " UNION ALL ".join(
        f"SELECT ({a} * p_partkey + {b}) % {_M} AS p FROM dim" for a, b in _COEFFS
    )
    joins = " ".join(
        f"LEFT JOIN words w{i + 1} ON CAST({p} {idiv} 32 AS INT) = w{i + 1}.word"
        for i, p in enumerate(probes)
    )
    tests = " AND ".join(
        f"(COALESCE(w{i + 1}.mask, 0) & {shift(f'{p} % 32')}) <> 0"
        for i, p in enumerate(probes)
    )
    return (
        "WITH dim AS (SELECT p_partkey, p_brand FROM part WHERE p_size = 1), "
        f"hpos AS ({dim_pos}), "
        f"words AS (SELECT CAST(p {idiv} 32 AS INT) AS word, "
        f"          bit_or({shift('p % 32')}) AS mask "
        f"          FROM hpos GROUP BY CAST(p {idiv} 32 AS INT)), "
        f"f AS (SELECT {hint3}l.l_partkey, l.l_extendedprice, l.l_discount "
        f"      FROM lineitem l {joins} WHERE {tests}) "
        f"SELECT {hintd}p_brand, CAST(COUNT(*) AS BIGINT) AS n_items, "
        "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * "
        "     (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(20,4)) "
        "     AS DOUBLE) AS revenue "
        "FROM f JOIN dim ON f.l_partkey = dim.p_partkey "
        "GROUP BY p_brand ORDER BY p_brand"
    )


_RF_ORACLE = (
    # the PLAIN join is the oracle: hash equality certifies the bloom
    # prefilter dropped no qualifying fact row (no false negatives)
    "WITH dim AS (SELECT p_partkey, p_brand FROM part WHERE p_size = 1) "
    "SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_items, "
    "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "     (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(20,4)) "
    "     AS DOUBLE) AS revenue "
    "FROM lineitem JOIN dim ON l_partkey = p_partkey "
    "GROUP BY p_brand ORDER BY p_brand"
)

sql_query(
    "join_bloom_runtime",
    _rf_sql("spark"),
    oracle=_RF_ORACLE,
    tables=("lineitem", "part"),
    tags=("join", "bloom", "runtime-filter", "scale"),
    doc=f"runtime Bloom-filtered join: {_M}-bit k={len(_COEFFS)} bitmap over "
    "the filtered dim keys, probed via three broadcast word-lookups inside "
    "the fact scan stage (zero added shuffles), exact join after; oracle = "
    "the plain join, so the hash match IS the no-false-negative proof",
)


# --------------------------------------------------------- quantile sketch
def _qsketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quantile_sketch import quantile_sketch_check

    ev = register_views(spark, sf_dir, ("events",))["events"]
    # integer cents (floor(value*100) is IEEE-identical in both engines)
    cents = ev.select(F.expr("CAST(FLOOR(value * 100) AS BIGINT)").alias("v"))
    return quantile_sketch_check(cents, "v", k=32)


df_query(
    "agg_quantile_sketch",
    _qsketch,
    oracle=(
        # the guarantee holds for ANY partitioning, so the oracle states
        # the booleans as literals (same contract as agg_heavy_hitters)
        "SELECT CAST(q AS INT) AS q_permille, "
        "(SELECT COUNT(*) FROM events) AS n_rows, "
        "CAST(32 AS INT) AS k, "
        "TRUE AS rank_ge_target, TRUE AS rank_within_bound "
        "FROM (SELECT UNNEST([500, 950, 990]) AS q) t ORDER BY q_permille"
    ),
    tables=("events",),
    tags=("telemetry", "sketch", "quantile"),
    doc="mergeable rank-grid quantile sketch (k=32 over value cents): "
    "per-partition grid summaries, merged CDF estimate, rank guarantee "
    "target <= true_rank <= target + sum(maxw) + max(maxw) certified "
    "against the exact rank — partitioning-independent contract",
)


# ------------------------------------------- large-star/small-star CC
def _components_lss(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components_lss import dup_components_lss

    pairs = _minhash_pairs_raw(spark, sf_dir)
    return dup_components_lss(pairs)


df_query(
    "dedup_components_lss",
    _components_lss,
    oracle=(
        # identical contract to dedup_components: min reachable id —
        # large-star/small-star's star centers ARE the component minima
        f"WITH RECURSIVE {_DUCK_PAIRS}, "
        "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs "
        "          UNION ALL SELECT doc_b, doc_a FROM pairs), "
        "reach(id, r) AS ("
        "  SELECT src, src FROM edges "
        "  UNION "
        "  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id) "
        "SELECT id AS doc_id, MIN(r) AS component FROM reach "
        "GROUP BY id ORDER BY doc_id"
    ),
    tables=DOCS,
    tags=("dedup", "components", "iterative", "scale"),
    doc="large-star/small-star connected components (Kiveris et al. "
    "2014): O(log n) rounds vs label propagation's O(diameter); same "
    "labels, same recursive-CTE oracle as dedup_components",
)


# The PRODUCTION components composition (r9 verdict #4): the LSS kernel
# over the hot-bucket-CAPPED candidate pipeline. dedup_components_lss
# deliberately composes the uncapped pairs (kernel-equivalence control
# vs dedup_components on identical input, quadratic upstream by design);
# this twin is the spelling a 100 TB corpus actually runs — sub-quadratic
# capped candidates feeding the O(log n)-round kernel — and it carries
# the scale probe's per-leg time gate past the control's 10x ceiling.
def _components_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components_lss import dup_components_lss

    pairs = _minhash_pairs_capped_raw(spark, sf_dir)
    return dup_components_lss(pairs)


df_query(
    "dedup_components_capped",
    _components_capped,
    oracle=(
        # min reachable id over the CAPPED edge set — the same recursive
        # CTE as dedup_components, with candidates only from buckets of
        # 2..cap members (the oracle replays the hot-bucket drop exactly)
        f"WITH RECURSIVE {_DUCK_PAIRS_CAPPED}, "
        "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs "
        "          UNION ALL SELECT doc_b, doc_a FROM pairs), "
        "reach(id, r) AS ("
        "  SELECT src, src FROM edges "
        "  UNION "
        "  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id) "
        "SELECT id AS doc_id, MIN(r) AS component FROM reach "
        "GROUP BY id ORDER BY doc_id"
    ),
    tables=DOCS,
    tags=("dedup", "components", "iterative", "scale"),
    doc="production components: large-star/small-star kernel over the "
    "hot-bucket-capped LSH candidates (sub-quadratic end to end) — the "
    "composition a crawl-scale dedup actually deploys; same "
    "min-reachable-id contract, certified by the capped recursive-CTE "
    "oracle",
)


# ---- count-min sketch certification ----------------------------------------
# The third mergeable-summary contract next to agg_heavy_hitters
# (Misra-Gries: frequent items) and agg_quantile_sketch (ranks): a
# count-min sketch (Cormode & Muthukrishnan '05) with d=3 salted hash
# rows x w=32 counters answers point frequency queries in O(d*w) space.
# Its signature guarantee — estimates NEVER undercount, min over rows
# bounds the overcount — is deterministic given the hash family, so the
# certification (zero underestimates + the full overestimate
# distribution) is hash-checked cross-engine, not just sampled. The
# sketch build is one hash agg over (row, bucket): mergeable across
# partitions/streams by cell-wise addition at any scale.

_CMS_D = 3
_CMS_W = 32


def _cms_sql(dialect: str) -> str:
    if dialect == "spark":
        idiv = "DIV"

        def bucket(k: str, r: str) -> str:
            return (
                "(CAST(conv(substr(md5(concat('cms', CAST({r} AS STRING), "
                "':', CAST({k} AS STRING))),1,15),16,10) AS BIGINT) "
                f"% {_CMS_W})"
            ).format(k=k, r=r)
    else:
        idiv = "//"

        def bucket(k: str, r: str) -> str:
            return (
                "(('0x' || substr(md5('cms' || CAST({r} AS VARCHAR) || "
                "':' || CAST({k} AS VARCHAR)),1,15))::BIGINT "
                f"% {_CMS_W})"
            ).format(k=k, r=r)

    salts = " UNION ALL ".join(f"SELECT {r} AS r" for r in range(_CMS_D))
    return (
        "WITH exact AS (SELECT user_id AS k, COUNT(*) AS c FROM events "
        "  GROUP BY user_id), "
        f"salts AS ({salts}), "
        f"cells AS (SELECT s.r, {bucket('e.k', 's.r')} AS b, "
        "  SUM(e.c) AS cell FROM exact e CROSS JOIN salts s "
        f"  GROUP BY s.r, {bucket('e.k', 's.r')}), "
        "est AS (SELECT e.k, e.c, MIN(cl.cell) AS est "
        "  FROM exact e CROSS JOIN salts s "
        f"  JOIN cells cl ON cl.r = s.r AND cl.b = {bucket('e.k', 's.r')} "
        "  GROUP BY e.k, e.c) "
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_keys, "
        "CAST(SUM(CASE WHEN est < c THEN 1 ELSE 0 END) AS BIGINT) "
        "  AS n_underestimates, "
        "CAST(SUM(CASE WHEN est = c THEN 1 ELSE 0 END) AS BIGINT) "
        "  AS n_exact, "
        "CAST(MAX(est - c) AS BIGINT) AS max_overestimate, "
        f"CAST(SUM(est - c) {idiv} COUNT(*) AS BIGINT) AS mean_overestimate "
        "FROM est ORDER BY n_keys"
    )


sql_query(
    "agg_cms_check",
    _cms_sql("spark"),
    oracle=_cms_sql("duck"),
    tables=("events",),
    tags=("agg", "sketch", "cms"),
    doc=f"count-min sketch (d={_CMS_D} x w={_CMS_W}) point-frequency "
    "certification over user_id: zero underestimates (the CM guarantee) "
    "+ exact-hit share + overestimate distribution, hash-checked",
)


# ---- TPC-H Q22 plan shape --------------------------------------------------
# Global-aggregate scalar subquery + decorrelated NOT EXISTS anti-join +
# final group — the "customers with money but no orders" sales-opportunity
# query. The average-balance threshold is evaluated as a cross-multiplied
# integer predicate (cents * n_total > total_cents) instead of a float
# AVG comparison, so boundary customers cannot flip between engines
# (D2: no float comparisons on aggregate boundaries). Catalyst plans the
# scalar subquery as a broadcast one-row join and the NOT EXISTS as a
# left-anti hash join on o_custkey — both shapes survive 100 TB.
_Q22 = (
    "WITH pool AS (SELECT c_custkey, c_nationkey, "
    "  CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS cents FROM customer "
    "  WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)), "
    "thr AS (SELECT COUNT(*) AS n, SUM(cents) AS tot FROM pool "
    "  WHERE cents > 0) "
    "SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust, "
    "CAST(SUM(cents) AS BIGINT) AS totacctbal_cents "
    "FROM pool CROSS JOIN thr "
    "WHERE cents * n > tot "
    "  AND NOT EXISTS (SELECT 1 FROM orders o "
    "                  WHERE o.o_custkey = pool.c_custkey "
    "                  AND o.o_orderpriority = '1-URGENT') "
    "GROUP BY c_nationkey ORDER BY c_nationkey"
)

sql_query(
    "q_sales_opportunity",
    _Q22,
    tables=("customer", "orders"),
    tags=("relational", "subquery", "anti-join"),
    doc="TPC-H Q22 shape: above-average-balance customers with no urgent orders "
    "per nation; scalar-subquery threshold as an exact integer "
    "cross-multiplication, NOT EXISTS as a left-anti hash join",
)


# ---------------------------------------------------------------- KMV theta
# The cardinality leg of the sketch tier (MG = frequency, rank-grid =
# quantiles, KMV = distinct + set algebra). Because the KMV hash is the
# portable md5 order (functions/hashing.py), the k-min sets and every
# estimate composed from them are bit-identical across engines - the only
# fully HASH-certified cardinality sketch in the registry (HLL stays
# tolerance-checked in agg_sketch_check). Spark side runs the mergeable
# operator (per-partition heap summaries, operators/kmv.py); the oracle
# replays the same k-min sets with a window rank - the sets are a data
# property, independent of partitioning, which is exactly why the sketch
# merges.

_KMV_K = 64
_KMV_D = 1 << 60
_KMV_A, _KMV_B = "click", "purchase"


def _kmv_est(n_col: str, hk_col: str):
    return (
        F.when(F.col(n_col) < _KMV_K, F.col(n_col))
        .otherwise(
            F.expr(
                f"CAST(({n_col} - 1) * CAST({_KMV_D} AS DECIMAL(38,0)) "
                f"DIV {hk_col} AS BIGINT)"
            )
        )
        .cast("long")
    )


def _kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.kmv import kmv_kmin

    ev = register_views(spark, sf_dir, ("events",))["events"]
    a = ev.where(F.col("event_type") == _KMV_A)
    b = ev.where(F.col("event_type") == _KMV_B)
    ka = kmv_kmin(a, "user_id", _KMV_K).select("h")
    kb = kmv_kmin(b, "user_id", _KMV_K).select("h")
    sa = ka.agg(F.count("*").alias("n_a"), F.max("h").alias("hk_a"))
    sb = kb.agg(F.count("*").alias("n_b"), F.max("h").alias("hk_b"))
    th = sa.crossJoin(sb).select(
        "n_a",
        "hk_a",
        "n_b",
        "hk_b",
        F.least(
            F.when(F.col("n_a") < _KMV_K, F.lit(_KMV_D)).otherwise(F.col("hk_a")),
            F.when(F.col("n_b") < _KMV_K, F.lit(_KMV_D)).otherwise(F.col("hk_b")),
        ).alias("theta"),
    )
    theta = F.broadcast(th.select("theta"))
    u_c = (
        ka.union(kb)
        .distinct()
        .crossJoin(theta)
        .where(F.col("h") < F.col("theta"))
        .agg(F.count("*").alias("u_c"))
    )
    i_c = (
        ka.join(kb, "h")
        .crossJoin(theta)
        .where(F.col("h") < F.col("theta"))
        .agg(F.count("*").alias("i_c"))
    )
    ex_a = a.agg(F.countDistinct("user_id").alias("exact_a"))
    ex_b = b.agg(F.countDistinct("user_id").alias("exact_b"))
    ex_u = (
        a.select("user_id")
        .union(b.select("user_id"))
        .distinct()
        .agg(F.count("*").alias("exact_union"))
    )
    da, db = a.select("user_id").distinct(), b.select("user_id").distinct()
    ex_i = da.join(db, "user_id").agg(F.count("*").alias("exact_inter"))

    one = (
        th.crossJoin(u_c).crossJoin(i_c)
        .crossJoin(ex_a).crossJoin(ex_b).crossJoin(ex_u).crossJoin(ex_i)
    )
    est_u = F.expr(
        f"CAST(u_c * CAST({_KMV_D} AS DECIMAL(38,0)) DIV theta AS BIGINT)"
    )
    est_i = F.expr(
        f"CAST(i_c * CAST({_KMV_D} AS DECIMAL(38,0)) DIV theta AS BIGINT)"
    )
    return one.select(
        F.lit(_KMV_K).cast("int").alias("k"),
        _kmv_est("n_a", "hk_a").alias("est_a"),
        F.col("exact_a").cast("long").alias("exact_a"),
        _kmv_est("n_b", "hk_b").alias("est_b"),
        F.col("exact_b").cast("long").alias("exact_b"),
        est_u.alias("est_union"),
        F.col("exact_union").cast("long").alias("exact_union"),
        est_i.alias("est_inter"),
        F.col("exact_inter").cast("long").alias("exact_inter"),
        F.expr(
            f"CAST(abs(CAST(u_c * CAST({_KMV_D} AS DECIMAL(38,0)) "
            "DIV theta AS BIGINT) - exact_union) * 1000 "
            "DIV (CASE WHEN exact_union = 0 THEN 1 ELSE exact_union END) "
            "AS BIGINT)"
        ).alias("err_union_permille"),
    ).orderBy("k")


def _kmv_duck() -> str:
    h = "(('0x' || substr(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT)"
    return (
        f"WITH ha AS (SELECT DISTINCT {h} AS h FROM events "
        f"            WHERE event_type = '{_KMV_A}' AND user_id IS NOT NULL), "
        f"hb AS (SELECT DISTINCT {h} AS h FROM events "
        f"       WHERE event_type = '{_KMV_B}' AND user_id IS NOT NULL), "
        "ka AS (SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) rn "
        f"       FROM ha) t WHERE rn <= {_KMV_K}), "
        "kb AS (SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) rn "
        f"       FROM hb) t WHERE rn <= {_KMV_K}), "
        "sa AS (SELECT COUNT(*) AS n_a, MAX(h) AS hk_a FROM ka), "
        "sb AS (SELECT COUNT(*) AS n_b, MAX(h) AS hk_b FROM kb), "
        "th AS (SELECT n_a, hk_a, n_b, hk_b, "
        f"  LEAST(CASE WHEN n_a < {_KMV_K} THEN {_KMV_D} ELSE hk_a END, "
        f"        CASE WHEN n_b < {_KMV_K} THEN {_KMV_D} ELSE hk_b END) "
        "    AS theta FROM sa CROSS JOIN sb), "
        "uc AS (SELECT COUNT(*) AS u_c FROM "
        "  (SELECT h FROM ka UNION SELECT h FROM kb) u CROSS JOIN th "
        "  WHERE h < theta), "
        "ic AS (SELECT COUNT(*) AS i_c FROM ka JOIN kb USING (h) "
        "  CROSS JOIN th WHERE h < theta), "
        "exa AS (SELECT COUNT(DISTINCT user_id) AS exact_a FROM events "
        f"  WHERE event_type = '{_KMV_A}'), "
        "exb AS (SELECT COUNT(DISTINCT user_id) AS exact_b FROM events "
        f"  WHERE event_type = '{_KMV_B}'), "
        "exu AS (SELECT COUNT(*) AS exact_union FROM (SELECT DISTINCT user_id "
        f"  FROM events WHERE event_type IN ('{_KMV_A}', '{_KMV_B}')) t), "
        "exi AS (SELECT COUNT(*) AS exact_inter FROM "
        f"  (SELECT DISTINCT user_id FROM events WHERE event_type = '{_KMV_A}') x "
        f"  JOIN (SELECT DISTINCT user_id FROM events "
        f"        WHERE event_type = '{_KMV_B}') y USING (user_id)) "
        f"SELECT CAST({_KMV_K} AS INT) AS k, "
        f"CAST(CASE WHEN n_a < {_KMV_K} THEN n_a "
        f"  ELSE ((n_a - 1)::HUGEINT * {_KMV_D}::HUGEINT) // hk_a END "
        "  AS BIGINT) AS est_a, "
        "CAST(exact_a AS BIGINT) AS exact_a, "
        f"CAST(CASE WHEN n_b < {_KMV_K} THEN n_b "
        f"  ELSE ((n_b - 1)::HUGEINT * {_KMV_D}::HUGEINT) // hk_b END "
        "  AS BIGINT) AS est_b, "
        "CAST(exact_b AS BIGINT) AS exact_b, "
        f"CAST((u_c::HUGEINT * {_KMV_D}::HUGEINT) // theta AS BIGINT) "
        "  AS est_union, "
        "CAST(exact_union AS BIGINT) AS exact_union, "
        f"CAST((i_c::HUGEINT * {_KMV_D}::HUGEINT) // theta AS BIGINT) "
        "  AS est_inter, "
        "CAST(exact_inter AS BIGINT) AS exact_inter, "
        f"CAST(ABS((u_c::HUGEINT * {_KMV_D}::HUGEINT) // theta "
        "  - exact_union) * 1000 "
        "  // (CASE WHEN exact_union = 0 THEN 1 ELSE exact_union END) "
        "  AS BIGINT) AS err_union_permille "
        "FROM th CROSS JOIN uc CROSS JOIN ic CROSS JOIN exa "
        "CROSS JOIN exb CROSS JOIN exu CROSS JOIN exi ORDER BY k"
    )


df_query(
    "agg_kmv_setops",
    _kmv_setops,
    oracle=_kmv_duck(),
    tables=("events",),
    tags=("sketch", "cardinality", "setops", "scale"),
    doc="KMV/theta-sketch distinct + set algebra over two user "
    "populations: per-partition bounded k-min heap summaries "
    "(operators/kmv.py) merged to the global k-min set, theta = "
    "min(h_(k)), union/intersection estimates from hashes below theta "
    "next to the exact counts - the fully hash-certified cardinality "
    "sketch (deterministic md5 order, bit-identical in DuckDB)",
)


def _kmv_grouped_sql(dialect: str) -> str:
    if dialect == "spark":
        h = "CAST(conv(substr(md5(CAST(user_id AS STRING)),1,15),16,10) AS BIGINT)"
        idiv = "DIV"
        est = (
            f"CASE WHEN n < {_KMV_K} THEN n "
            f"ELSE CAST((n - 1) * CAST({_KMV_D} AS DECIMAL(38,0)) "
            "DIV hk AS BIGINT) END"
        )
    else:
        h = "(('0x' || substr(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT)"
        idiv = "//"
        est = (
            f"CASE WHEN n < {_KMV_K} THEN n "
            f"ELSE CAST(((n - 1)::HUGEINT * {_KMV_D}::HUGEINT) "
            "// hk AS BIGINT) END"
        )
    return (
        f"WITH hs AS (SELECT DISTINCT event_type, {h} AS h FROM events "
        "  WHERE user_id IS NOT NULL), "
        "k AS (SELECT event_type, h, ROW_NUMBER() OVER ("
        "  PARTITION BY event_type ORDER BY h) AS rn FROM hs), "
        "s AS (SELECT event_type, COUNT(*) AS n, MAX(h) AS hk FROM k "
        f"  WHERE rn <= {_KMV_K} GROUP BY event_type), "
        "e AS (SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct "
        "  FROM events GROUP BY event_type) "
        "SELECT s.event_type, "
        f"CAST({est} AS BIGINT) AS est_distinct, "
        "CAST(e.exact_distinct AS BIGINT) AS exact_distinct, "
        f"CAST(ABS({est} - e.exact_distinct) * 1000 "
        f"  {idiv} e.exact_distinct AS BIGINT) AS err_permille "
        "FROM s JOIN e ON s.event_type = e.event_type "
        "ORDER BY s.event_type"
    )


sql_query(
    "agg_kmv_grouped",
    _kmv_grouped_sql("spark"),
    oracle=_kmv_grouped_sql("duck"),
    tables=("events",),
    tags=("sketch", "cardinality", "agg", "scale"),
    doc="grouped KMV distinct-count estimates (per event_type distinct "
    "users, k=64) next to the exact counts and the resulting error "
    "permille - the GROUP-BY approximate-distinct production shape, "
    "hash-certified end to end because the k-min order is the portable "
    "md5 order; at scale the per-group k-min folds into the bounded "
    "operators/kmv.py summaries",
)
