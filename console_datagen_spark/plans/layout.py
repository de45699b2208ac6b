"""Storage-layout queries: Z-order clustering for multi-dimensional
data skipping.

At 100 TB, scan cost is dominated by how much of the table a filter can
skip. Min/max footer stats skip well on ONE column (the sort key) and
poorly on everything else; sorting by an interleaved-bit Morton (Z-order)
curve gives every participating dimension locality, so a filter on ANY of
them prunes most files (the Delta/Iceberg ``OPTIMIZE ZORDER BY``
technique). The curve value is pure integer bit arithmetic — identical in
Spark and DuckDB — so the layout decision itself is hash-certified:
``layout_zorder`` buckets lineitem by the top bits of
``morton(l_orderkey, l_partkey)`` and reports each bucket's per-dimension
min/max envelope; tight envelopes in BOTH dimensions are exactly the
property that makes footer-stats skipping work. A plain sort by
``l_orderkey`` would give tight envelopes on orderkey only — partkey
envelopes would each span the whole domain.

The 16-bit spread is the standard mask ladder (public-domain "Bit
Twiddling Hacks" dilation):

    x = (x | x<<8) & 0x00FF00FF; x = (x | x<<4) & 0x0F0F0F0F
    x = (x | x<<2) & 0x33333333; x = (x | x<<1) & 0x55555555

Writer integration: ``df.repartitionByRange(N, F.col("z")).sortWithinPartitions("z")``
then write — each output file covers one tight Z-range; the bucket report
here is the engine-verifiable core of that layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import register_views
from .registry import df_query, sql_query

_MASKS = ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555))


def _spread(expr: str, shift_fn) -> str:
    """Dilate the low 16 bits of ``expr`` so bit i lands at bit 2i."""
    x = f"(CAST({expr} AS BIGINT) & 65535)"  # BIGINT up front: 32-bit shifts overflow INT32
    for sh, mask in _MASKS:
        x = f"(({x} | {shift_fn(x, sh)}) & {mask})"
    return x


def _morton_sql(a: str, b: str, dialect: str) -> str:
    if dialect == "spark":
        shift = lambda x, n: f"shiftleft({x}, {n})"  # noqa: E731
        final = lambda x: f"shiftleft({x}, 1)"  # noqa: E731
    else:
        shift = lambda x, n: f"({x} << {n})"  # noqa: E731
        final = lambda x: f"({x} << 1)"  # noqa: E731
    return f"({_spread(a, shift)} | {final(_spread(b, shift))})"


def _zorder_sql(dialect: str) -> str:
    idiv = "DIV" if dialect == "spark" else "//"
    z = _morton_sql("l_orderkey", "l_partkey", dialect)
    return (
        # 32 buckets over the 32-bit curve: top 5 bits
        f"SELECT CAST(z {idiv} 134217728 AS BIGINT) AS zbucket, "
        "CAST(COUNT(*) AS BIGINT) AS n_rows, "
        "MIN(l_orderkey % 65536) AS min_ok, MAX(l_orderkey % 65536) AS max_ok, "
        "MIN(l_partkey % 65536) AS min_pk, MAX(l_partkey % 65536) AS max_pk "
        f"FROM (SELECT l_orderkey, l_partkey, {z} AS z FROM lineitem) t "
        f"GROUP BY CAST(z {idiv} 134217728 AS BIGINT) ORDER BY zbucket"
    )


sql_query(
    "layout_zorder",
    _zorder_sql("spark"),
    oracle=_zorder_sql("duck"),
    tables=("lineitem",),
    tags=("layout", "zorder", "skipping"),
    doc="Z-order (Morton) layout buckets over (l_orderkey, l_partkey): "
    "interleaved-bit curve value, 32 top-bit buckets, per-bucket min/max "
    "envelope in BOTH dimensions — the engine-checkable core of "
    "OPTIMIZE ZORDER-style multi-dimensional data skipping",
)


# ---- key-skew telemetry ----------------------------------------------------

# the at-scale shuffle-health gauge behind operators/skew.py: before
# keying a 100 TB aggregation on a column, measure how hot its hottest
# key is. skew_permille = 1000 * max_key_count * n_keys / total — 1000
# means perfectly uniform, 10x that means the hottest key holds ~10
# uniform key-shares and the groupBy wants salting (salted_agg) or AQE
# skew handling. Two hash aggregations, both map-side combining.


def _skew_sql(idiv: str) -> str:
    return (
        "WITH pk AS (SELECT event_type, user_id, COUNT(*) AS cnt "
        "            FROM events GROUP BY event_type, user_id) "
        "SELECT event_type, "
        "CAST(COUNT(*) AS BIGINT) AS n_keys, "
        "CAST(SUM(cnt) AS BIGINT) AS total, "
        "CAST(MAX(cnt) AS BIGINT) AS max_key, "
        f"CAST(MAX(cnt) * 1000 * COUNT(*) {idiv} SUM(cnt) AS BIGINT) "
        "  AS skew_permille "
        "FROM pk GROUP BY event_type ORDER BY event_type"
    )


sql_query(
    "agg_key_skew",
    _skew_sql("DIV"),
    oracle=_skew_sql("//"),
    tables=("events",),
    tags=("telemetry", "skew", "agg"),
    doc="per-event-type key-skew gauge over user_id: n_keys / total / "
    "hottest-key count / skew permille (1000 = uniform) — the measurement "
    "that decides between a plain groupBy and operators/skew.salted_agg "
    "at 100 TB",
)


def _heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.heavy_hitters import heavy_hitters_check

    ev = register_views(spark, sf_dir, ("events",))["events"]
    # k=4 < 5 distinct event types forces real MG decrements: the sketch
    # cannot just hold exact counts, so the guarantee booleans certify
    # genuine bounded-memory behavior, not a degenerate exact path
    return heavy_hitters_check(ev, "event_type", k=4)


df_query(
    "agg_heavy_hitters",
    _heavy,
    oracle=(
        # the guarantees hold for ANY partitioning, so the oracle states
        # them as literals and only the exact heavy count is computed —
        # the same certified-within-tolerance contract as agg_sketch_check
        "WITH c AS (SELECT event_type, COUNT(*) AS cnt FROM events "
        "           GROUP BY event_type), "
        "t AS (SELECT (SELECT COUNT(*) FROM events) AS n) "
        "SELECT CAST(4 AS INT) AS k, "
        "CAST((SELECT n FROM t) AS BIGINT) AS n_rows, "
        "CAST((SELECT COUNT(*) FROM c WHERE cnt > (SELECT n FROM t) // 5) "
        "     AS BIGINT) AS n_true_heavy, "
        "TRUE AS all_heavy_found, TRUE AS no_overestimate, "
        "TRUE AS underestimate_within_bound ORDER BY k"
    ),
    tables=("events",),
    tags=("telemetry", "sketch", "heavy-hitters"),
    doc="Misra-Gries heavy hitters (k=4 over event_type): per-partition "
    "Arrow-batched MG summaries, mergeable-summaries trim, guarantees "
    "(all heavy found / no overestimate / error <= N/(k+1)) certified "
    "against exact counts — partitioning-independent contract",
)


def _outlier_sql(idiv: str) -> str:
    # all arithmetic on integer cents (floor(value*100) is IEEE-identical
    # in both engines), MAD-style robust spread: mean absolute deviation
    # in cents; an event is an outlier when its deviation > 3x the MAD.
    return (
        "WITH iv AS (SELECT event_type, event_id, "
        "            CAST(FLOOR(value * 100) AS BIGINT) AS v FROM events), "
        f"st AS (SELECT event_type, COUNT(*) AS n, SUM(v) {idiv} COUNT(*) AS mean_c "
        "       FROM iv GROUP BY event_type), "
        "dv AS (SELECT i.event_type, ABS(i.v - s.mean_c) AS dev, s.n, s.mean_c "
        "       FROM iv i JOIN st s ON i.event_type = s.event_type), "
        f"md AS (SELECT event_type, CAST(SUM(dev) {idiv} MAX(n) AS BIGINT) AS mad_c "
        "       FROM dv GROUP BY event_type) "
        "SELECT d.event_type, CAST(MAX(d.n) AS BIGINT) AS n, "
        "CAST(MAX(d.mean_c) AS BIGINT) AS mean_c, "
        "CAST(MAX(m.mad_c) AS BIGINT) AS mad_c, "
        "CAST(SUM(CASE WHEN d.dev > 3 * m.mad_c THEN 1 ELSE 0 END) AS BIGINT) "
        "  AS n_outliers "
        "FROM dv d JOIN md m ON d.event_type = m.event_type "
        "GROUP BY d.event_type ORDER BY d.event_type"
    )


sql_query(
    "agg_outlier_events",
    _outlier_sql("DIV"),
    oracle=_outlier_sql("//"),
    tables=("events",),
    tags=("telemetry", "quality", "agg"),
    doc="robust outlier gauge per event type: integer-cent values, mean "
    "absolute deviation spread, count of >3xMAD deviants — the DQ tripwire "
    "for a value column before it feeds training features",
)


def _salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe fact-dim join certified against the plain-join oracle.

    The salted two-sided pattern (operators/skew.salted_join): fact keys
    get a deterministic salt, the dim side replicates salt_buckets times,
    and the join key becomes (key, salt) — a hot supplier's rows spread
    over salt_buckets reducers instead of one. Salting must not change
    the answer; the DuckDB plain join IS the semantics contract.
    """
    from ..operators.skew import salted_join

    t = register_views(spark, sf_dir, ("lineitem", "supplier"))
    fact = t["lineitem"].select(
        F.col("l_suppkey").alias("suppkey"), "l_quantity"
    )
    dim = t["supplier"].select(
        F.col("s_suppkey").alias("suppkey"), "s_nationkey"
    )
    return (
        salted_join(fact, dim, on=["suppkey"], salt_buckets=8)
        .groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("l_quantity").cast("double").alias("total_qty"),
        )
        .orderBy("s_nationkey")
    )


df_query(
    "join_salted_volume",
    _salted_join,
    oracle=(
        "SELECT s_nationkey, COUNT(*) AS n_items, "
        "CAST(SUM(l_quantity) AS DOUBLE) AS total_qty "
        "FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "GROUP BY s_nationkey ORDER BY s_nationkey"
    ),
    tables=("lineitem", "supplier"),
    tags=("join", "skew", "telemetry"),
    doc="salted skew-safe join (fact salted, dim replicated x8) rolled up "
    "per nation — hash-identical to the plain join, certifying salting "
    "changes the shuffle, never the answer",
)


def _pct_sql(idiv: str) -> str:
    # exact order-statistic percentiles on integer cents, computed over
    # the CDF of DISTINCT values: counts per (type, value) hash-aggregate
    # map-side, the running sum then windows over the value DOMAIN
    # (bounded, ~1e5 cents) instead of the row count — so at 100 TB no
    # reducer ever sorts a type's full event stream. pXX = smallest value
    # whose cumulative count covers XX% of n (percentile_disc semantics).
    return (
        "WITH iv AS (SELECT event_type, "
        "            CAST(FLOOR(value * 100) AS BIGINT) AS v FROM events), "
        "cd AS (SELECT event_type, v, COUNT(*) AS c FROM iv "
        "       GROUP BY event_type, v), "
        "r AS (SELECT event_type, v, "
        "      SUM(c) OVER (PARTITION BY event_type ORDER BY v) AS cum, "
        "      SUM(c) OVER (PARTITION BY event_type) AS n FROM cd) "
        "SELECT event_type, CAST(MAX(n) AS BIGINT) AS n, "
        "CAST(MIN(CASE WHEN cum * 100 >= 50 * n THEN v END) AS BIGINT) AS p50_c, "
        "CAST(MIN(CASE WHEN cum * 100 >= 95 * n THEN v END) AS BIGINT) AS p95_c, "
        "CAST(MIN(CASE WHEN cum * 100 >= 99 * n THEN v END) AS BIGINT) AS p99_c "
        "FROM r GROUP BY event_type ORDER BY event_type"
    )


sql_query(
    "agg_percentiles_exact",
    _pct_sql("DIV"),
    oracle=_pct_sql("//"),
    tables=("events",),
    tags=("telemetry", "agg", "percentile"),
    doc="exact p50/p95/p99 (percentile_disc semantics) per event type on "
    "integer cents — the deterministic twin of the approx-sketch gauge "
    "(agg_sketch_check certifies the approximate path)",
)


def _hist_sql(idiv: str) -> str:
    # equi-width histogram on integer cents: bin = v DIV width; emitting
    # (bin lo/hi, count, permille share). Two hash aggs, map-side
    # combining; the bin count is domain-bound, not row-bound.
    return (
        "WITH iv AS (SELECT CAST(FLOOR(value * 100) AS BIGINT) AS v "
        "            FROM events), "
        f"b AS (SELECT v {idiv} 2500 AS bin, COUNT(*) AS c FROM iv GROUP BY 1), "
        "t AS (SELECT SUM(c) AS n FROM b) "
        "SELECT CAST(bin AS BIGINT) AS bin, "
        "CAST(bin * 2500 AS BIGINT) AS lo_c, "
        "CAST((bin + 1) * 2500 - 1 AS BIGINT) AS hi_c, "
        "CAST(c AS BIGINT) AS n_events, "
        f"CAST(c * 1000 {idiv} (SELECT n FROM t) AS BIGINT) AS share_permille "
        "FROM b ORDER BY bin"
    )


sql_query(
    "agg_value_histogram",
    _hist_sql("DIV"),
    oracle=_hist_sql("//"),
    tables=("events",),
    tags=("telemetry", "agg", "histogram"),
    doc="equi-width value histogram (25.00-unit bins on integer cents) "
    "with permille shares — the distribution snapshot behind the "
    "outlier/percentile gauges",
)


def _profile_sql(dialect: str) -> str:
    # per-column profile via stacked aggregates: one scan, five profiles.
    # Values are summarized as strings per column (min/max castable), so
    # one narrow schema serves heterogeneous columns — the standard
    # profiler output shape.
    # `value` is profiled on integer cents: raw double stringification
    # is not portable across engines (scientific-notation thresholds
    # differ), floor-cents are
    cols = {
        "event_id": "event_id",
        "user_id": "user_id",
        "event_type": "event_type",
        "value_cents": "CAST(FLOOR(value * 100) AS BIGINT)",
        "props": "props",
    }
    cast = "STRING" if dialect == "spark" else "VARCHAR"
    branches = " UNION ALL ".join(
        f"SELECT '{name}' AS col, CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(COUNT({expr}) AS BIGINT) AS n_nonnull, "
        f"CAST(COUNT(DISTINCT {expr}) AS BIGINT) AS n_distinct, "
        f"CAST(MIN(CAST({expr} AS {cast})) AS {cast}) AS min_str, "
        f"CAST(MAX(CAST({expr} AS {cast})) AS {cast}) AS max_str "
        "FROM events"
        for name, expr in cols.items()
    )
    return f"SELECT * FROM ({branches}) ORDER BY col"


sql_query(
    "profile_events_columns",
    _profile_sql("spark"),
    oracle=_profile_sql("duck"),
    tables=("events",),
    tags=("telemetry", "profile", "dq"),
    doc="column profiler over events: per column n / non-null / distinct "
    "+ stringified min/max — the schema-drift tripwire run before any "
    "ingest lands in the lake",
)


# ---- data-skipping A/B gauge -----------------------------------------------
# layout_zorder reports the envelopes; this query closes the loop and
# measures what those envelopes BUY: for one fixed two-dimensional range
# predicate, how many file-buckets survive min/max pruning under (a) a
# layout sorted by orderkey, (b) sorted by partkey, (c) Z-ordered?
# rows_scanned is the post-pruning scan volume; scan_x_permille is scan
# amplification vs a perfect index (1000 = reads exactly the matching
# rows). Single-dim sorts prune one dimension and read ~everything for
# the other; the Morton layout prunes on both — the number that justifies
# OPTIMIZE ZORDER at 100 TB, certified engine-side in integers.

_PRED_LO, _PRED_HI = 4096, 8191  # one 1/16 slice of each 16-bit domain
_BUCKET_W = 2048  # 32 value-range buckets per single-dim layout


def _skip_ab_sql(dialect: str) -> str:
    idiv = "DIV" if dialect == "spark" else "//"
    z = _morton_sql("ok16", "pk16", dialect)
    # order-preserving rescale of each key into the full 16-bit domain
    # (key * 65536 DIV (max+1)) — raw keys at small scale factors occupy
    # a fraction of 16 bits and every arm would trivially prune to zero
    base = (
        "ext AS (SELECT CAST(MAX(l_orderkey) + 1 AS BIGINT) AS mok, "
        "  CAST(MAX(l_partkey) + 1 AS BIGINT) AS mpk FROM lineitem), "
        "scaled AS (SELECT "
        f"  CAST(CAST(l_orderkey AS BIGINT) * 65536 {idiv} mok AS BIGINT) "
        "    AS ok16, "
        f"  CAST(CAST(l_partkey AS BIGINT) * 65536 {idiv} mpk AS BIGINT) "
        "    AS pk16 "
        "  FROM lineitem CROSS JOIN ext), "
        f"base AS (SELECT ok16, pk16, {z} AS z FROM scaled)"
    )
    layouts = (
        ("sort_orderkey", f"ok16 {idiv} {_BUCKET_W}"),
        ("sort_partkey", f"pk16 {idiv} {_BUCKET_W}"),
        ("zorder", f"z {idiv} 134217728"),
    )
    arms = []
    for name, bucket in layouts:
        arms.append(
            f"SELECT '{name}' AS layout, "
            "CAST(COUNT(*) AS BIGINT) AS n_buckets, "
            "CAST(SUM(cand) AS BIGINT) AS n_candidate, "
            "CAST(SUM(cand * n_rows) AS BIGINT) AS rows_scanned "
            f"FROM (SELECT {bucket} AS b, COUNT(*) AS n_rows, "
            f"CASE WHEN MAX(ok16) >= {_PRED_LO} AND MIN(ok16) <= {_PRED_HI} "
            f"      AND MAX(pk16) >= {_PRED_LO} AND MIN(pk16) <= {_PRED_HI} "
            "THEN 1 ELSE 0 END AS cand "
            f"FROM base GROUP BY {bucket}) t"
        )
    union = " UNION ALL ".join(arms)
    return (
        f"WITH {base}, "
        "matched AS (SELECT CAST(COUNT(*) AS BIGINT) AS rows_matched "
        f"  FROM base WHERE ok16 BETWEEN {_PRED_LO} AND {_PRED_HI} "
        f"  AND pk16 BETWEEN {_PRED_LO} AND {_PRED_HI}), "
        f"arms AS ({union}) "
        "SELECT a.layout, a.n_buckets, a.n_candidate, a.rows_scanned, "
        "m.rows_matched, "
        f"CAST(a.rows_scanned * 1000 {idiv} "
        "  (CASE WHEN m.rows_matched = 0 THEN 1 ELSE m.rows_matched END) "
        "  AS BIGINT) AS scan_x_permille "
        "FROM arms a CROSS JOIN matched m ORDER BY a.layout"
    )


sql_query(
    "layout_skipping_ab",
    _skip_ab_sql("spark"),
    oracle=_skip_ab_sql("duck"),
    tables=("lineitem",),
    tags=("layout", "zorder", "skipping"),
    doc="min/max-pruning A/B for a 2-dim range predicate under three "
    "layouts (orderkey-sorted, partkey-sorted, Z-ordered): candidate "
    "buckets, post-pruning scan volume, and scan amplification vs a "
    "perfect index — the measured benefit of multi-dimensional layout",
)


def _winsor_sql(idiv: str) -> str:
    # winsorization with EXACT order-statistic bounds, reusing the
    # distinct-value CDF (no full-stream sort at any scale): p05/p95
    # clip thresholds per event type, then the clipped sum and the
    # clip-volume tallies — the robust-scaling feature prep that
    # neutralizes tail outliers before normalization.
    return (
        "WITH iv AS (SELECT event_type, "
        "            CAST(FLOOR(value * 100) AS BIGINT) AS v FROM events), "
        "cd AS (SELECT event_type, v, COUNT(*) AS c FROM iv "
        "       GROUP BY event_type, v), "
        "r AS (SELECT event_type, v, "
        "      SUM(c) OVER (PARTITION BY event_type ORDER BY v) AS cum, "
        "      SUM(c) OVER (PARTITION BY event_type) AS n FROM cd), "
        "bounds AS (SELECT event_type, "
        "  MIN(CASE WHEN cum * 100 >= 5 * n THEN v END) AS lo, "
        "  MIN(CASE WHEN cum * 100 >= 95 * n THEN v END) AS hi "
        "  FROM r GROUP BY event_type) "
        "SELECT i.event_type, CAST(b.lo AS BIGINT) AS p05_c, "
        "CAST(b.hi AS BIGINT) AS p95_c, "
        "CAST(SUM(CASE WHEN i.v < b.lo THEN 1 ELSE 0 END) AS BIGINT) "
        "  AS n_clipped_low, "
        "CAST(SUM(CASE WHEN i.v > b.hi THEN 1 ELSE 0 END) AS BIGINT) "
        "  AS n_clipped_high, "
        "CAST(SUM(LEAST(GREATEST(i.v, b.lo), b.hi)) AS BIGINT) "
        "  AS winsorized_sum_c "
        "FROM iv i JOIN bounds b ON i.event_type = b.event_type "
        "GROUP BY i.event_type, b.lo, b.hi ORDER BY i.event_type"
    )


sql_query(
    "feat_winsorize",
    _winsor_sql("DIV"),
    oracle=_winsor_sql("//"),
    tables=("events",),
    tags=("feature-store", "robust", "percentile"),
    doc="winsorization at exact p05/p95 (distinct-value CDF, no "
    "full-stream sort): clip thresholds, clip-volume tallies and the "
    "winsorized sum per event type — robust feature scaling prep",
)


# ---- Hilbert-curve layout arm ----------------------------------------------
# The other space-filling curve: Hilbert preserves locality strictly
# better than Morton (no Z-shape jumps between quadrants), which at
# 100 TB means tighter per-file envelopes for the same file count. The
# standard xy->d algorithm is an iterative quadrant-rotation fold, which
# unrolls into a chain of per-level CTEs of pure integer CASE arithmetic
# (no xor spelling differences: the Gray-code increment over (rx, ry) is
# a 4-way CASE) - bit-identical in Spark and DuckDB, so the layout
# decision is hash-certified exactly like layout_zorder. Reference shape:
# the public-domain xy2d loop (Wikipedia "Hilbert curve", convert+rotate).

_HILBERT_ORDER = 16  # 16-bit x/y -> 32-bit d, same domain as the Morton arm


def _hilbert_ctes(src: str) -> tuple[str, str]:
    """CTE chain h0..h{order}: fold from (ok16, pk16) to hilbert d.

    ``src`` must expose ok16/pk16 (and any passthrough columns); each
    level consumes the previous one. Passthrough columns survive because
    every level re-selects them via ``* EXCEPT`` - spelled portably by
    listing only the three fold columns plus ok16/pk16/z.
    """
    parts = [
        f"h0 AS (SELECT ok16, pk16, z, ok16 AS hx, pk16 AS hy, "
        f"CAST(0 AS BIGINT) AS hd FROM {src})"
    ]
    lvl = 0
    for i in range(_HILBERT_ORDER - 1, -1, -1):
        s = 1 << i
        rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
        # Gray-code quadrant index (3*rx) XOR ry without xor():
        quad = (
            f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 "
            f"WHEN {rx} = 0 THEN 1 WHEN {ry} = 1 THEN 2 ELSE 3 END)"
        )
        nxt = lvl + 1
        parts.append(
            f"h{nxt} AS (SELECT ok16, pk16, z, "
            # rotate/reflect the sub-square, then swap axes (ry=0 branch)
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
            f"  THEN {s} - 1 - hy ELSE hy END) ELSE hx END AS hx, "
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
            f"  THEN {s} - 1 - hx ELSE hx END) ELSE hy END AS hy, "
            f"hd + CAST({s} AS BIGINT) * {s} * {quad} AS hd "
            f"FROM h{lvl})"
        )
        lvl = nxt
    return ", ".join(parts), f"h{lvl}"


def _hilbert_ab_sql(dialect: str) -> str:
    """The skipping A/B extended with the Hilbert arm: same rescaled
    16-bit domain, same 2-dim range predicate, same 32-bucket layouts -
    plus hd-bucketed Hilbert. Emits the identical report columns so the
    two queries read side-by-side."""
    idiv = "DIV" if dialect == "spark" else "//"
    z = _morton_sql("ok16", "pk16", dialect)
    base = (
        "ext AS (SELECT CAST(MAX(l_orderkey) + 1 AS BIGINT) AS mok, "
        "  CAST(MAX(l_partkey) + 1 AS BIGINT) AS mpk FROM lineitem), "
        "scaled AS (SELECT "
        f"  CAST(CAST(l_orderkey AS BIGINT) * 65536 {idiv} mok AS BIGINT) "
        "    AS ok16, "
        f"  CAST(CAST(l_partkey AS BIGINT) * 65536 {idiv} mpk AS BIGINT) "
        "    AS pk16 "
        "  FROM lineitem CROSS JOIN ext), "
        f"base AS (SELECT ok16, pk16, {z} AS z FROM scaled)"
    )
    hctes, hfinal = _hilbert_ctes("base")
    layouts = (
        ("hilbert", f"hd {idiv} 134217728"),
        ("zorder", f"z {idiv} 134217728"),
    )
    arms = []
    for name, bucket in layouts:
        arms.append(
            f"SELECT '{name}' AS layout, "
            "CAST(COUNT(*) AS BIGINT) AS n_buckets, "
            "CAST(SUM(cand) AS BIGINT) AS n_candidate, "
            "CAST(SUM(cand * n_rows) AS BIGINT) AS rows_scanned "
            f"FROM (SELECT {bucket} AS b, COUNT(*) AS n_rows, "
            f"CASE WHEN MAX(ok16) >= {_PRED_LO} AND MIN(ok16) <= {_PRED_HI} "
            f"      AND MAX(pk16) >= {_PRED_LO} AND MIN(pk16) <= {_PRED_HI} "
            "THEN 1 ELSE 0 END AS cand "
            f"FROM {hfinal} GROUP BY {bucket}) t"
        )
    union = " UNION ALL ".join(arms)
    return (
        f"WITH {base}, {hctes}, "
        "matched AS (SELECT CAST(COUNT(*) AS BIGINT) AS rows_matched "
        f"  FROM base WHERE ok16 BETWEEN {_PRED_LO} AND {_PRED_HI} "
        f"  AND pk16 BETWEEN {_PRED_LO} AND {_PRED_HI}), "
        f"arms AS ({union}) "
        "SELECT a.layout, a.n_buckets, a.n_candidate, a.rows_scanned, "
        "m.rows_matched, "
        f"CAST(a.rows_scanned * 1000 {idiv} "
        "  (CASE WHEN m.rows_matched = 0 THEN 1 ELSE m.rows_matched END) "
        "  AS BIGINT) AS scan_x_permille "
        "FROM arms a CROSS JOIN matched m ORDER BY a.layout"
    )


sql_query(
    "layout_hilbert_ab",
    _hilbert_ab_sql("spark"),
    oracle=_hilbert_ab_sql("duck"),
    tables=("lineitem",),
    tags=("layout", "hilbert", "zorder", "skipping"),
    doc="Hilbert-vs-Morton skipping A/B under the same 2-dim range "
    "predicate and 32-bucket budget: the Hilbert fold (unrolled "
    "quadrant-rotation CTE chain, pure integer CASE arithmetic) vs the "
    "Z-order arm - candidate buckets, post-pruning scan volume and scan "
    "amplification, hash-certified in both engines",
)


# ---- small-file compaction planner (r14) ------------------------------------
#
# The OTHER half of layout maintenance: Z-order/Hilbert decide WHERE rows
# go; compaction decides WHICH small files to coalesce toward the target
# file size (Delta OPTIMIZE / Iceberg rewrite_data_files bin-packing).
# The planner is pure SQL: within each table partition, files roll into
# bins by running-total DIV target, in cluster-key order — the ordering
# preservation is the point (coalescing must not shuffle the curve
# layout). A bin may overshoot by at most one file, exactly like the
# greedy packer those engines ship. Scale shape: one window per
# PARTITION (never a global sort) over the file MANIFEST — at 100 TB the
# manifest is ~1e6 rows, not data; planning cost is independent of data
# volume. File sizes here are synthesized deterministically from the
# orders fixture (64 KiB..8 MiB via a Knuth-hash spread) so both engines
# replay the identical manifest.

_COMPACT_TARGET = 32 * 1024 * 1024  # bytes per output file


def _compaction_sql(dialect: str) -> str:
    idiv = "DIV" if dialect == "spark" else "//"
    return (
        "WITH manifest AS (SELECT "
        "  year(o_orderdate) * 100 + month(o_orderdate) AS pt, "
        "  o_orderkey AS file_id, "
        "  65536 + (o_orderkey * 2654435761) % 8323072 AS bytes "
        "  FROM orders), "
        "rolled AS (SELECT pt, file_id, bytes, "
        "  COALESCE(SUM(bytes) OVER (PARTITION BY pt ORDER BY file_id "
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        f"  {idiv} {_COMPACT_TARGET} AS bin FROM manifest) "
        "SELECT pt, CAST(bin AS BIGINT) AS bin, "
        "CAST(COUNT(*) AS BIGINT) AS n_files, "
        "CAST(SUM(bytes) AS BIGINT) AS bin_bytes, "
        "CAST(MIN(file_id) AS BIGINT) AS first_file, "
        "CAST(MAX(file_id) AS BIGINT) AS last_file, "
        f"CAST(SUM(bytes) * 1000 {idiv} {_COMPACT_TARGET} AS BIGINT) "
        "  AS fill_permille "
        "FROM rolled GROUP BY pt, bin ORDER BY pt, bin"
    )


sql_query(
    "layout_compaction_plan",
    _compaction_sql("spark"),
    oracle=_compaction_sql("duck"),
    tables=("orders",),
    tags=("layout", "compaction", "binpack", "maintenance"),
    doc="small-file compaction planner (Delta OPTIMIZE / Iceberg "
    "rewrite_data_files shape): within each table partition, manifest "
    "files roll into target-size bins by running-total in cluster-key "
    "order (order-preserving greedy, overshoot bounded by one file) - "
    "per-bin file count, bytes, id range and fill permille, planned "
    "from the manifest alone so cost is independent of data volume",
)
