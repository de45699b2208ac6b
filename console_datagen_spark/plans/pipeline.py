"""Flagship composed pipelines (north-star: corpus curation + data quality).

``pipeline_curation`` chains the canonical training-data preparation
stages — exact dedup → quality gate → stable sample → per-language stats —
in ONE declarative query, so Catalyst fuses the whole pipeline (scan once,
no intermediate materialization). Every stage uses the integer/hash
arithmetic the standalone queries certify, so the composition is fully
DuckDB-oracle-checked too.

``dq_checks`` is the constraint-validation surface: null counts, key
uniqueness, FK orphans — one row of violation counters over the star
schema (the shape a data-quality gate evaluates before a training run).
"""

from __future__ import annotations

from .registry import sql_query


def _curation_sql(dialect: str) -> str:
    if dialect == "spark":
        ntok = "size(split(text, ' '))"
        ndis = "size(array_distinct(split(text, ' ')))"
        bucket = (
            "(CAST(conv(substr(md5(concat('v1:', CAST(doc_id AS STRING))),1,15),"
            "16,10) AS BIGINT) % 1000)"
        )
    else:
        ntok = "len(string_split(text, ' '))"
        ndis = "len(list_distinct(string_split(text, ' ')))"
        bucket = (
            "(('0x' || substr(md5(concat('v1:', CAST(doc_id AS VARCHAR))),1,15))"
            "::BIGINT % 1000)"
        )
    return (
        # stage 1: exact dedup — keep the lowest doc_id per identical text
        "WITH keeper AS (SELECT MIN(doc_id) AS doc_id FROM documents "
        "               GROUP BY md5(text)), "
        # stage 2: quality gate — length band + distinct-token ratio
        "quality AS (SELECT d.doc_id, d.lang, d.n_chars FROM documents d "
        "            JOIN keeper k ON d.doc_id = k.doc_id "
        f"           WHERE {ntok} BETWEEN 10 AND 1000 "
        f"           AND {ndis} * 1000 >= 200 * {ntok}), "
        # stage 3: stable 50% sample by hash bucket
        f"sampled AS (SELECT * FROM quality WHERE {bucket} < 500) "
        # stage 4: corpus stats per language
        "SELECT lang, COUNT(*) AS docs, "
        "CAST(SUM(n_chars) AS BIGINT) AS chars, "
        "CAST(MIN(doc_id) AS BIGINT) AS first_doc "
        "FROM sampled GROUP BY lang ORDER BY lang"
    )


sql_query(
    "pipeline_curation",
    _curation_sql("spark"),
    oracle=_curation_sql("duck"),
    tables=("documents",),
    tags=("pipeline", "dedup", "quality", "sampling"),
    doc="composed curation pipeline: dedup → quality → sample → stats, one plan",
)

sql_query(
    "dq_checks",
    "SELECT "
    "CAST((SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) AS BIGINT) "
    "AS null_custkeys, "
    "CAST((SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders) AS BIGINT) "
    "AS dup_orderkeys, "
    # orphan = non-null FK with no parent (null FKs are the null counter's)
    "CAST((SELECT COUNT(*) FROM orders o LEFT JOIN customer c "
    "      ON o.o_custkey = c.c_custkey "
    "      WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL) AS BIGINT) "
    "AS orphan_orders, "
    "CAST((SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o "
    "      ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL) AS BIGINT) "
    "AS orphan_lineitems, "
    "CAST((SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0) AS BIGINT) "
    "AS nonpositive_qty",
    tables=("orders", "customer", "lineitem"),
    tags=("quality", "validation"),
    doc="data-quality gate: nulls / key uniqueness / FK orphans / domain checks",
)


# ---- query #100: the full training-mix pipeline, fused -------------------
#
# Exact-dedup keepers -> repetition/length quality gate -> 8-gram holdout
# decontamination -> per-language stratified mix -> token-budget report.
# One declarative plan: Catalyst fuses the gates into the scans, the only
# shuffles are the two hash groupBys (dedup keys, shingle ids) and the
# final 5-row aggregate. This is the corpus-curation recipe end-to-end —
# every stage individually certified elsewhere, composed here.

_MIX_SPARK = """
WITH keepers AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
base AS (
  -- REPARTITION(__PAR__): the 8-gram shingle/md5 stage below is fed by this
  -- scan; a single-file corpus would pin it to one task and AQE cannot
  -- widen a tiny-byte/huge-CPU stage (it sizes by bytes)
  SELECT d.doc_id, d.lang, split(d.text, ' ') AS l
  FROM (SELECT /*+ REPARTITION(__PAR__) */ * FROM documents) d
  JOIN keepers k ON d.doc_id = k.doc_id
),
quality AS (
  SELECT doc_id, lang, l FROM base
  WHERE size(l) >= 20
    AND (size(l) - size(array_distinct(l))) * 1000 DIV size(l) < 700
),
sh AS (
  SELECT doc_id, explode(transform(sequence(1, size(l) - 7),
         i -> concat_ws(' ', slice(l, i, 8)))) AS s
  FROM (SELECT doc_id, l FROM base WHERE size(l) >= 8) b
),
ids AS (SELECT DISTINCT doc_id, md5(s) AS h FROM sh),
hold AS (SELECT DISTINCT h FROM ids WHERE doc_id % 10 = 0),
contaminated AS (
  SELECT DISTINCT i.doc_id FROM ids i JOIN hold USING (h)
  WHERE i.doc_id % 10 <> 0
),
clean AS (
  SELECT q.doc_id, q.lang, q.l FROM quality q
  WHERE q.doc_id % 10 <> 0
    AND NOT EXISTS (SELECT 1 FROM contaminated c WHERE c.doc_id = q.doc_id)
),
sampled AS (
  SELECT doc_id, lang, size(l) AS toks FROM clean
  WHERE CAST(conv(substr(md5(concat('mix:', CAST(doc_id AS STRING))), 1, 15),
             16, 10) AS BIGINT) % 1000
        < CASE lang WHEN 'en' THEN 400 ELSE 900 END
)
SELECT lang, COUNT(*) AS docs, CAST(SUM(toks) AS BIGINT) AS tokens,
       CAST(SUM(toks) * 1000 DIV (SELECT SUM(toks) FROM sampled) AS BIGINT)
         AS token_share_permille
FROM sampled GROUP BY lang ORDER BY lang
"""

_MIX_DUCK = """
WITH keepers AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
base AS (
  SELECT d.doc_id, d.lang, string_split(d.text, ' ') AS l
  FROM documents d JOIN keepers k ON d.doc_id = k.doc_id
),
quality AS (
  SELECT doc_id, lang, l FROM base
  WHERE len(l) >= 20
    AND (len(l) - len(list_distinct(l))) * 1000 // len(l) < 700
),
sh AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(l) - 7),
         i -> array_to_string(l[i:i+7], ' '))) AS s
  FROM (SELECT doc_id, l FROM base WHERE len(l) >= 8) b
),
ids AS (SELECT DISTINCT doc_id, md5(s) AS h FROM sh),
hold AS (SELECT DISTINCT h FROM ids WHERE doc_id % 10 = 0),
contaminated AS (
  SELECT DISTINCT i.doc_id FROM ids i JOIN hold USING (h)
  WHERE i.doc_id % 10 <> 0
),
clean AS (
  SELECT q.doc_id, q.lang, q.l FROM quality q
  WHERE q.doc_id % 10 <> 0
    AND NOT EXISTS (SELECT 1 FROM contaminated c WHERE c.doc_id = q.doc_id)
),
sampled AS (
  SELECT doc_id, lang, len(l) AS toks FROM clean
  WHERE (('0x' || substr(md5(concat('mix:', CAST(doc_id AS VARCHAR))), 1, 15))
          ::BIGINT) % 1000
        < CASE lang WHEN 'en' THEN 400 ELSE 900 END
)
SELECT lang, COUNT(*) AS docs, CAST(SUM(toks) AS BIGINT) AS tokens,
       CAST(SUM(toks) * 1000 // (SELECT SUM(toks) FROM sampled) AS BIGINT)
         AS token_share_permille
FROM sampled GROUP BY lang ORDER BY lang
"""

sql_query(
    "pipeline_training_mix",
    _MIX_SPARK,
    oracle=_MIX_DUCK,
    tables=("documents",),
    tags=("pipeline", "dedup", "quality", "decontamination", "sampling"),
    doc="fused corpus-curation pipeline: exact dedup -> quality gate -> "
    "8-gram decontamination -> per-language stratified mix -> token report",
)


# Temperature-flattened mix weighting (T=0.5 via sqrt): the standard
# rebalancing that upweights small sources in a training mix. Weights are
# floored to integer permille BEFORE the normalizing sum so every
# aggregate is order-free integer arithmetic (a raw double SUM() OVER ()
# would be partition-order-dependent); sqrt and double division are
# IEEE-identical in both engines, so the whole thing hash-matches with
# the oracle reusing the same SQL text verbatim.
sql_query(
    "pipeline_temperature_mix",
    "WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs "
    "           FROM documents GROUP BY source), "
    "w AS (SELECT source, n_docs, "
    "      CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE)) * 1000) AS BIGINT) AS wt "
    "      FROM c), "
    "t AS (SELECT source, n_docs, wt, SUM(wt) OVER () AS sw, "
    "      SUM(n_docs) OVER () AS total FROM w) "
    "SELECT source, n_docs, "
    "CAST(FLOOR(n_docs * 1000.0 / total) AS BIGINT) AS raw_share_permille, "
    "CAST(FLOOR(wt * 1000.0 / sw) AS BIGINT) AS temp_share_permille, "
    "CAST(FLOOR(5000 * wt * 1.0 / sw) AS BIGINT) AS alloc_docs "
    "FROM t ORDER BY source",
    tables=("documents",),
    tags=("pipeline", "mix", "temperature"),
    doc="temperature-flattened (T=0.5, sqrt) source mix weighting: "
    "integer-permille weights, order-free sums, 5000-doc allocation",
)


# ---- SFT chat templating + loss-mask accounting ----------------------------
# The standard instruction-tuning prep stage: flatten multi-turn
# conversations into one role-tagged training string and account for
# which tokens train (assistant turns) vs are masked (user turns) — the
# numbers every SFT data report carries (trainable-token share, turns,
# lengths). Synthetic conversation structure over the documents table:
# conversation = doc_id DIV 8 (8 turns), turn = doc_id % 8, roles
# alternate user/assistant, so every engine derives identical
# conversations with no extra fixture. The rendered template is emitted
# as its md5 (portable, and keeps the certified frame narrow while
# still pinning every byte of the rendering); token counts are
# whitespace tokens + 2 specials per turn. Scale shape: one shuffle to
# group doc_id DIV 8 (at 100 TB: conversations are already the natural
# key of chat corpora), ordered in-group concat via sorted collect /
# ordered string_agg — no window over the corpus, no Python.

_CHAT_TURNS = 8


def _chat_sql(dialect: str) -> str:
    # text is wrapped in COALESCE(text, '') on BOTH sides: Spark's concat
    # yields NULL on any NULL arg (the whole turn would vanish from
    # array_join) while DuckDB's concat skips NULL args (renders
    # '<|role|><|end|>') — without the pin, a NULL text would diverge
    # template_md5/n_tok across engines and the contract held only
    # because the fixture happens to be non-null (ADVICE r12).
    if dialect == "spark":
        render = (
            "md5(array_join(transform(array_sort(collect_list(struct("
            "turn, role, text))), s -> concat('<|', s.role, '|>', s.text, "
            "'<|end|>')), ''))"
        )
        ntok = "size(split(COALESCE(text, ''), ' ')) + 2"
        idiv = "DIV"
    else:
        render = (
            "md5(string_agg(concat('<|', role, '|>', text, '<|end|>'), "
            "'' ORDER BY turn))"
        )
        ntok = "len(string_split(COALESCE(text, ''), ' ')) + 2"
        idiv = "//"
    return (
        f"WITH turns AS (SELECT doc_id {idiv} {_CHAT_TURNS} AS conv_id, "
        f"doc_id % {_CHAT_TURNS} AS turn, "
        f"CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role, "
        f"COALESCE(text, '') AS text, "
        f"CAST({ntok} AS BIGINT) AS n_tok FROM documents), "
        "conv AS (SELECT conv_id, COUNT(*) AS n_turns, "
        "SUM(n_tok) AS n_tokens_total, "
        "SUM(CASE WHEN role = 'assistant' THEN n_tok ELSE 0 END) "
        "AS n_tokens_trainable, "
        f"{render} AS template_md5 "
        "FROM turns GROUP BY conv_id) "
        "SELECT conv_id, CAST(n_turns AS BIGINT) AS n_turns, "
        # explicit BIGINT: DuckDB's SUM(BIGINT) yields HUGEINT, which
        # fetchdf degrades to float64 and the strict value-hash rejects
        "CAST(n_tokens_total AS BIGINT) AS n_tokens_total, "
        "CAST(n_tokens_trainable AS BIGINT) AS n_tokens_trainable, "
        f"CAST((1000 * n_tokens_trainable) {idiv} n_tokens_total AS BIGINT) "
        "AS trainable_permille, template_md5 "
        "FROM conv WHERE n_turns >= 2 ORDER BY conv_id"
    )


sql_query(
    "pipeline_chat_template",
    _chat_sql("spark"),
    oracle=_chat_sql("duck"),
    tables=("documents",),
    tags=("pipeline", "sft", "chat", "templating"),
    doc="SFT chat templating: 8-turn synthetic conversations rendered to "
    "'<|role|>text<|end|>' strings (certified via md5 of the exact "
    "rendering) with loss-mask accounting — trainable (assistant) vs "
    "masked token counts and permille share per conversation",
)


def _epoch_shuffle_sql(dialect: str) -> str:
    """Deterministic epoch shuffle — the data-loading order a training
    run consumes. Spark-first shape: shard = seeded-hash mod N is a
    plain hash repartition, and the intra-shard order is a PARTITIONED
    window sort (each shard sorts locally after one shuffle) — there is
    NO global ORDER BY anywhere, so at 100 TB this is one exchange plus
    embarrassingly-parallel per-shard sorts, never a single-reducer
    total order. Three epochs run side by side from different seed
    strings; order_fp = SUM((pos+1) * doc_id) is position-weighted, so
    the hash gate certifies the PERMUTATION itself (any swap of two
    docs within a shard moves the fingerprint), and differing fps
    across epochs pin that reseeding actually re-shuffles."""
    if dialect == "spark":
        h = (
            "CAST(conv(substr(md5(concat('epoch', CAST(e AS STRING), ':', "
            "CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        )
        epochs = "(SELECT explode(sequence(1, 3)) AS e)"
    else:
        h = (
            "('0x' || substr(md5(concat('epoch', CAST(e AS VARCHAR), ':', "
            "CAST(doc_id AS VARCHAR))), 1, 15))::BIGINT"
        )
        epochs = "(SELECT unnest(generate_series(1, 3)) AS e)"
    return (
        f"WITH keyed AS (SELECT e, doc_id, {h} AS hkey "
        f"FROM documents CROSS JOIN {epochs} t), "
        "ordered AS (SELECT e, doc_id, hkey % 8 AS shard, "
        "  ROW_NUMBER() OVER (PARTITION BY e, hkey % 8 "
        "                     ORDER BY hkey, doc_id) - 1 AS pos "
        "  FROM keyed) "
        "SELECT CAST(e AS INT) AS epoch, CAST(shard AS INT) AS shard, "
        "CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM((pos + 1) * doc_id) AS BIGINT) AS order_fp, "
        "CAST(MIN(CASE WHEN pos = 0 THEN doc_id END) AS BIGINT) AS head_doc "
        "FROM ordered GROUP BY e, shard ORDER BY epoch, shard"
    )


sql_query(
    "pipeline_epoch_shuffle",
    _epoch_shuffle_sql("spark"),
    oracle=_epoch_shuffle_sql("duck"),
    tables=("documents",),
    tags=("pipeline", "sampling", "training"),
    doc="seeded epoch shuffle for training data loading: shard by hash, "
    "order within shard by seeded key — no global sort; the position-"
    "weighted fingerprint certifies the exact permutation per epoch and "
    "that different epochs yield different orders",
)


_K_ANON_SQL = (
    # Privacy release gate: k-anonymity + l-diversity over the
    # quasi-identifier (nation, market segment) with account-balance
    # tier as the sensitive attribute. One hash-aggregate pass (partial
    # map-side combine; QI cardinality is tiny vs rows, so the shuffle
    # carries only group rows) — the shape a 100 TB release audit needs:
    # never materialize per-row risk, only per-group counters.
    "WITH g AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS sz, "
    "  COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg' "
    "    WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END) AS l "
    "  FROM customer GROUP BY c_nationkey, c_mktsegment) "
    "SELECT CAST(COUNT(*) AS BIGINT) AS n_groups, "
    "CAST(MIN(sz) AS BIGINT) AS k_anonymity, "
    "CAST(SUM(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT) "
    "  AS groups_below_5, "
    "CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT) "
    "  AS rows_at_risk, "
    "CAST(MIN(l) AS BIGINT) AS l_diversity "
    # single-row global aggregate; the ORDER BY is vacuous but keeps the
    # static total-order guard (test_every_query_has_total_order) simple
    "FROM g ORDER BY n_groups"
)

sql_query(
    "dq_k_anonymity",
    _K_ANON_SQL,
    tables=("customer",),
    tags=("quality", "privacy"),
    doc="privacy release gate: k-anonymity (min QI-group size), "
    "suppression exposure (groups/rows under k=5) and l-diversity "
    "(min distinct sensitive tiers per group) in one aggregate pass",
)


def _url_canon_sql(dialect: str) -> str:
    """Crawl-frontier URL canonicalization — the dedup stage that runs
    BEFORE any content fetch in a real pipeline (a canonical-URL
    collision skips the fetch entirely, so at crawl scale this one
    string pass saves more compute than any content-level dedup).

    Spec-correct per RFC 3986: scheme and host are case-INsensitive and
    are lowercased; the path/query is case-sensitive and is preserved.
    Also unified: http->https, `www.` strip, default-port strip
    (:80/:443), fragment strip, utm_* tracking-param removal with
    separator repair, and trailing-slash normalization. Deterministic
    messy URLs are synthesized per doc (case noise, optional www/port/
    params/fragment), so the oracle certifies every rule: a wrong or
    missing rewrite changes the collision histogram.

    Dialect traps pinned here: DuckDB regexp_replace is FIRST-match
    without the 'g' flag (Spark is always global), replacement group
    syntax is $1 vs \\1, and backslash escaping differs in string
    literals — the `rr` helper owns all three."""
    spark = dialect == "spark"
    s = "STRING" if spark else "VARCHAR"
    g1 = "$1" if spark else "\\1"
    bs = "\\\\" if spark else "\\"

    def rr(expr: str, pat: str, rep: str) -> str:
        if spark:
            return f"regexp_replace({expr}, '{pat}', '{rep}')"
        return f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"

    raw = (
        "concat('HTTP', CASE WHEN doc_id % 2 = 0 THEN 'S' ELSE '' END, "
        "'://', CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END, "
        f"'Site', CAST(doc_id % 5 AS {s}), '.Example.COM', "
        "CASE WHEN doc_id % 4 = 0 THEN ':443' WHEN doc_id % 4 = 2 THEN ':80' "
        "ELSE '' END, "
        f"'/Docs/', CAST(doc_id % 10 AS {s}), "
        "CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END, "
        "CASE WHEN doc_id % 3 = 1 THEN "
        f"concat('?utm_source=feed&utm_id=', CAST(doc_id % 4 AS {s}), "
        f"'&id=', CAST(doc_id % 10 AS {s})) "
        "WHEN doc_id % 3 = 2 THEN "
        f"concat('?id=', CAST(doc_id % 10 AS {s})) ELSE '' END, "
        "CASE WHEN doc_id % 5 = 4 THEN '#Frag' ELSE '' END)"
    )
    sh0 = "regexp_extract(u, '^[A-Za-z]+://[^/?#]*', 0)"
    sh_canon = rr(
        rr(rr(f"lower({sh0})", "^http://", "https://"),
           f"^(https://)www{bs}.", g1),
        ":(443|80)$",
        "",
    )
    r = f"substr(u, length({sh0}) + 1)"
    r = rr(r, "#.*", "")  # fragment
    r = rr(r, "utm_[a-z]+=[^&#]*", "")  # tracking params
    r = rr(r, "&&+", "&")  # doubled separators left by removal
    r = rr(r, f"{bs}?&", "?")  # leading param was removed
    r = rr(r, "[?&]+$", "")  # dangling separators
    r = rr(r, f"/{bs}?", "?")  # path trailing slash before query
    rest_canon = rr(r, "/$", "")  # path trailing slash at end
    return (
        f"WITH urls AS (SELECT doc_id, {raw} AS u FROM documents), "
        f"canon AS (SELECT doc_id, u, concat({sh_canon}, {rest_canon}) AS cu "
        "FROM urls), "
        "grp AS (SELECT cu, COUNT(*) AS n_variants, "
        "COUNT(DISTINCT u) AS n_distinct_raw, MIN(doc_id) AS keeper "
        "FROM canon GROUP BY cu) "
        "SELECT CAST(n_variants AS INT) AS variants_per_canonical, "
        "CAST(COUNT(*) AS BIGINT) AS n_canonicals, "
        "CAST(SUM(n_distinct_raw) AS BIGINT) AS raw_urls, "
        "CAST(SUM(keeper) AS BIGINT) AS keeper_sum "
        "FROM grp GROUP BY n_variants ORDER BY variants_per_canonical"
    )


sql_query(
    "dedup_url_canonical",
    _url_canon_sql("spark"),
    oracle=_url_canon_sql("duck"),
    tables=("documents",),
    tags=("dedup", "pipeline", "crawl"),
    doc="crawl-frontier URL canonicalization (RFC 3986 case rules, "
    "http->https, www/default-port/fragment/utm strip, separator "
    "repair, trailing-slash normalization) with a collision histogram "
    "certifying every rewrite rule",
)


# ---- differentially-private histogram release -------------------------------

# The release mechanism the k-anonymity gate above gauges exposure FOR:
# an eps-DP discrete-Laplace (two-sided geometric) noisy count release
# over the same (nation, market segment) quasi-identifier histogram.
# With alpha = exp(-eps) = 1/2 (eps = ln 2, sensitivity 1: each customer
# lands in exactly one group), the two-sided geometric pmf is
#   P(Z=0) = 1/3,  P(Z=+-k) = (1/3) * (1/2)^k
# and every inverse-CDF boundary is a DYADIC rational over 3, so with
# the seeded 60-bit uniform U = md5('dp1:'||key)[:15 hex] the exact
# integer comparisons  3U < 2^(61-k)  decide the tail depth with no
# floats anywhere:  P(Z <= -k) = (1/3)(1/2)^(k-1)  <=>  3U < 2^(61-k),
# so |negative tail| = #{k in 1..60 : 3U < 2^(61-k)} = max(0, 61 -
# bitlen(3U)) — one LENGTH(bin(.)) per group, the positive side by the
# reflection U -> 2^60-1-U (the two sides are provably exclusive:
# both nonzero would need 3U < 2^60 AND 3U > 2^61-3). Determinism IS
# the certification here: the seeded mechanism replays bit-identically
# on both engines, while a production release would swap the md5 seed
# for a fresh secret draw — the mechanism's DP guarantee is a property
# of the distribution, which the seeded replay shares. Scale shape: one
# hash aggregate to the group frame (tiny vs rows), then per-GROUP
# scalar noise — no per-row work, no join, no window; the 100 TB
# release costs exactly the histogram aggregate.

_DP_U = (
    "CAST(conv(substr(md5(concat('dp1:', CAST(c_nationkey AS STRING), "
    "':', c_mktsegment)), 1, 15), 16, 10) AS BIGINT)"
)
_DP_U_DUCK = (
    "('0x' || substr(md5('dp1:' || CAST(c_nationkey AS VARCHAR) || "
    "':' || c_mktsegment), 1, 15))::BIGINT"
)


def _dp_release_sql(dialect: str) -> str:
    u = _DP_U if dialect == "spark" else _DP_U_DUCK
    two60 = str(1 << 60)
    return (
        "WITH g AS (SELECT c_nationkey, c_mktsegment, "
        "  COUNT(*) AS n_true FROM customer "
        "  GROUP BY c_nationkey, c_mktsegment), "
        f"seeded AS (SELECT c_nationkey, c_mktsegment, n_true, {u} AS u "
        "  FROM g), "
        "noised AS (SELECT c_nationkey, c_mktsegment, n_true, "
        "  LEAST(60, GREATEST(0, 61 - LENGTH(bin("
        f"    3 * ({two60} - 1 - u))))) "
        "  - LEAST(60, GREATEST(0, 61 - LENGTH(bin(3 * u)))) AS z "
        "  FROM seeded) "
        "SELECT CAST(c_nationkey AS INT) AS c_nationkey, c_mktsegment, "
        "CAST(n_true AS BIGINT) AS n_true, CAST(z AS BIGINT) AS noise, "
        "CAST(GREATEST(n_true + z, 0) AS BIGINT) AS n_released, "
        "CAST(ABS(z) AS BIGINT) AS abs_err "
        "FROM noised ORDER BY c_nationkey, c_mktsegment"
    )


sql_query(
    "dq_dp_noisy_release",
    _dp_release_sql("spark"),
    oracle=_dp_release_sql("duck"),
    tables=("customer",),
    tags=("quality", "privacy", "dp"),
    doc="eps-DP (eps=ln 2) discrete-Laplace noisy release of the "
    "(nation, segment) QI histogram: seeded 60-bit uniform per group, "
    "exact integer inverse-CDF (dyadic-over-3 boundaries decided by "
    "3U < 2^(61-k) bit-length comparisons), clamped post-processing — "
    "the release mechanism paired with the dq_k_anonymity exposure gate",
)


# ---- general-alpha temperature mix (the alpha=0.3 sampling law) ------------

# pipeline_temperature_mix reaches T=0.5 because sqrt is the ONE power
# IEEE guarantees correctly rounded; the published multilingual law
# (Conneau et al. 2020, XLM-R: p_l ~ n_l^alpha with alpha = 0.3) needs
# an arbitrary rational exponent. n^(3/10) = exp2(3*log2(n)/10) runs
# entirely in the fixed-point integer log/exp pair
# (functions/intlog.py + functions/intexp.py): log2 by digit-by-digit
# squaring, the exponent scaled by the exact rational 3/10 in
# fixed-point, exp2 by per-bit constant multiplies — every step BIGINT,
# bit-identical on both engines, so the ppm shares hash-certify where a
# libm POW(n, 0.3) could flip a floor on one engine. Scale shape: one
# hash aggregate to the per-source count frame, the log/exp chains run
# over its DISTINCT counts (a handful of rows), one order-free integer
# SUM for the normalizer — the 100 TB cost is the count aggregate.


def _alpha_mix_sql(dialect: str) -> str:
    from ..functions.intexp import exp2_fp_ctes
    from ..functions.intlog import log2_fp_ctes

    idiv = "DIV" if dialect == "spark" else "//"
    ntok = (
        "size(split(text, ' '))"
        if dialect == "spark"
        else "len(string_split(text, ' '))"
    )
    return (
        # n_l = per-language TOKEN totals (what the published law
        # weighs), skewed en-heavy in the fixture like real crawls
        f"WITH c AS (SELECT lang, CAST(SUM({ntok}) AS BIGINT) AS n_tokens "
        "           FROM documents GROUP BY lang), "
        "vals AS (SELECT DISTINCT n_tokens AS nv FROM c), "
        + log2_fp_ctes("vals", "nv", "nv", "1", dialect, out="lg")
        + ", sc AS (SELECT nv, (lg_fp * 3) " + idiv + " 10 AS axfp FROM lg), "
        + exp2_fp_ctes("sc", "nv", "axfp", dialect, out="ex")
        + ", w AS (SELECT c.lang, c.n_tokens, ex.ex_fp AS wt "
        "  FROM c JOIN ex ON ex.nv = c.n_tokens), "
        "t AS (SELECT lang, n_tokens, wt, SUM(wt) OVER () AS sw, "
        "      SUM(n_tokens) OVER () AS tot FROM w) "
        "SELECT lang, n_tokens, CAST(wt AS BIGINT) AS weight_fp, "
        f"CAST((n_tokens * 1000000) {idiv} tot AS BIGINT) AS raw_ppm, "
        f"CAST((wt * 1000000) {idiv} sw AS BIGINT) AS sample_ppm "
        "FROM t ORDER BY lang"
    )


sql_query(
    "pipeline_alpha_mix",
    _alpha_mix_sql("spark"),
    oracle=_alpha_mix_sql("duck"),
    tables=("documents",),
    tags=("pipeline", "mix", "temperature", "alpha"),
    doc="general-alpha temperature sampling weights (alpha=0.3, the "
    "XLM-R multilingual law): n^0.3 = exp2(0.3*log2 n) via the paired "
    "fixed-point integer log/exp chains — hash-exact ppm shares where "
    "libm POW could flip a floor; sqrt only ever reaches alpha=1/2",
)
