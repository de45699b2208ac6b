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
from .dedup import _DUCK_PAIRS, _minhash_pairs
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

    pairs = _minhash_pairs(spark, sf_dir)
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
