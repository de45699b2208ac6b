"""Text-analysis queries over the ``documents`` fixture (north-star surface).

Token counting, quality scoring, language-ID scoring, fingerprinting — all
expressed with built-in collection functions (split/filter/array_distinct),
so they stay inside whole-stage codegen; no Python in the hot path. All
ratio math is exact integer permille (floor DIV) so the DuckDB oracle
matches bit-for-bit (FIXTURES.md D2 analog for ratios).

The lang-ID marker sets are deterministic stand-ins wired to the synthetic
fixture vocabulary; a real deployment swaps in per-language character-n-gram
profiles — the operator shape (per-class token scoring + argmax with stable
tiebreak) is what's certified here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import register_views
from .registry import CacheSlot, df_query, sql_query

DOCS = ("documents",)

# Q19 [north-star: text analysis] per-language corpus stats
sql_query(
    "q19_lang_stats",
    "SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS chars, COUNT(*) AS docs "
    "FROM documents GROUP BY lang ORDER BY lang",
    tables=DOCS,
    tags=("text", "agg"),
    doc="Q19: tokenize+count per lang (SURVEY §2.11)",
)

sql_query(
    "text_token_stats",
    "SELECT doc_id, CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens, "
    "CAST(size(array_distinct(split(text, ' '))) AS BIGINT) AS n_distinct "
    "FROM documents ORDER BY doc_id",
    oracle=(
        "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, "
        "CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct "
        "FROM documents ORDER BY doc_id"
    ),
    tables=DOCS,
    tags=("text",),
    doc="token counting: whitespace tokenizer, per-doc totals",
)

sql_query(
    "text_token_freq",
    "SELECT tok, COUNT(*) AS n FROM "
    "(SELECT explode(split(text, ' ')) AS tok FROM documents) t "
    "GROUP BY tok ORDER BY n DESC, tok LIMIT 100",
    oracle=(
        "SELECT tok, COUNT(*) AS n FROM "
        "(SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t "
        "GROUP BY tok ORDER BY n DESC, tok LIMIT 100"
    ),
    tables=DOCS,
    tags=("text", "topk"),
    doc="global token frequency top-100 (explode → count → top-n)",
)

_STOP = "('the','a','of','to')"
sql_query(
    "text_quality",
    "SELECT doc_id, "
    "CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens, "
    "CAST(size(array_distinct(split(text, ' '))) * 1000 "
    "     DIV size(split(text, ' ')) AS BIGINT) AS distinct_permille, "
    f"CAST(size(filter(split(text, ' '), t -> t IN {_STOP})) * 1000 "
    "     DIV size(split(text, ' ')) AS BIGINT) AS stop_permille, "
    "CAST((n_chars - (size(split(text, ' ')) - 1)) * 100 "
    "     DIV size(split(text, ' ')) AS BIGINT) AS avg_tok_len_x100, "
    "CAST(CASE WHEN size(split(text, ' ')) BETWEEN 10 AND 1000 "
    "     AND size(array_distinct(split(text, ' '))) * 1000 "
    "         >= 200 * size(split(text, ' ')) "
    "     THEN 1 ELSE 0 END AS INT) AS quality_ok "
    "FROM documents ORDER BY doc_id",
    oracle=(
        "SELECT doc_id, "
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, "
        "CAST(len(list_distinct(string_split(text, ' '))) * 1000 "
        "     // len(string_split(text, ' ')) AS BIGINT) AS distinct_permille, "
        f"CAST(len(list_filter(string_split(text, ' '), t -> t IN {_STOP})) * 1000 "
        "     // len(string_split(text, ' ')) AS BIGINT) AS stop_permille, "
        "CAST((n_chars - (len(string_split(text, ' ')) - 1)) * 100 "
        "     // len(string_split(text, ' ')) AS BIGINT) AS avg_tok_len_x100, "
        "CAST(CASE WHEN len(string_split(text, ' ')) BETWEEN 10 AND 1000 "
        "     AND len(list_distinct(string_split(text, ' '))) * 1000 "
        "         >= 200 * len(string_split(text, ' ')) "
        "     THEN 1 ELSE 0 END AS INT) AS quality_ok "
        "FROM documents ORDER BY doc_id"
    ),
    tables=DOCS,
    tags=("text", "quality"),
    doc="quality scoring: length/distinct/stopword ratios in exact permille",
)

_MARKERS = {
    "de": "('table','row','scan')",
    "en": "('the','a','fast')",
    "es": "('data','query','value')",
    "fr": "('join','merge','sort')",
    "zh": "('stream','batch','window')",
}


def _langid_sql(size_fn: str, filter_fn: str, split_fn: str) -> str:
    scores = ", ".join(
        f"CAST({size_fn}({filter_fn}({split_fn}(text, ' '), "
        f"t -> t IN {mk})) AS BIGINT) AS s_{lang}"
        for lang, mk in _MARKERS.items()
    )
    return (
        f"WITH sc AS (SELECT doc_id, lang, {scores} FROM documents) "
        "SELECT doc_id, lang, s_de, s_en, s_es, s_fr, s_zh, "
        "CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr "
        "          AND s_de >= s_zh THEN 'de' "
        "     WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en' "
        "     WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es' "
        "     WHEN s_fr >= s_zh THEN 'fr' ELSE 'zh' END AS pred_lang "
        "FROM sc ORDER BY doc_id"
    )


sql_query(
    "text_langid",
    _langid_sql("size", "filter", "split"),
    oracle=_langid_sql("len", "list_filter", "string_split"),
    tables=DOCS,
    tags=("text", "langid"),
    doc="language-ID: per-class marker-token scoring + stable argmax",
)

sql_query(
    "text_fingerprint",
    "SELECT doc_id, SUBSTR(md5(text), 1, 16) AS fp FROM documents ORDER BY doc_id",
    tables=DOCS,
    tags=("text", "hash"),
    doc="document fingerprint (content hash prefix; md5 is cross-engine)",
)


def _scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import scrub_pii

    docs = register_views(spark, sf_dir, DOCS)["documents"]
    # the fixture corpus is PII-free, so deterministic PII is synthesized
    # per doc (email + IP + phone + long account number) and the scrub is
    # certified by replaying the identical construction+redaction in SQL
    raw = docs.select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 40),
            F.lit(" reach user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or 10.20."),
            (F.col("doc_id") % 200).cast("string"),
            F.lit(".9 call 555-867-5309 acct 9000000"),
            F.col("doc_id").cast("string"),
        ).alias("raw"),
    )
    return raw.select("doc_id", scrub_pii("raw").alias("scrubbed")).orderBy(
        "doc_id"
    )


def _scrub_oracle() -> str:
    from ..functions.text import PII_PATTERNS

    expr = "raw"
    for pattern, token in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pattern}', '{token}', 'g')"
    return (
        "WITH r AS (SELECT doc_id, "
        "SUBSTR(text, 1, 40) || ' reach user' || CAST(doc_id AS VARCHAR) || "
        "'@mail.example.com or 10.20.' || CAST(doc_id % 200 AS VARCHAR) || "
        "'.9 call 555-867-5309 acct 9000000' || CAST(doc_id AS VARCHAR) AS raw "
        "FROM documents) "
        f"SELECT doc_id, {expr} AS scrubbed FROM r ORDER BY doc_id"
    )


df_query(
    "text_scrub_pii",
    _scrub,
    oracle=_scrub_oracle(),
    tables=DOCS,
    tags=("text", "pii"),
    doc="PII redaction: email/IP/phone/account-number → typed placeholders "
    "(chained regexp_replace, codegen; north-star curation pass)",
)


# mean token rarity: rarity(tok) = n_docs*1000 DIV doc-frequency (integer
# permille); a doc full of corpus-rare tokens scores high. The doc-level
# mean uses SUM DIV COUNT so both engines agree bit-for-bit.
_RARITY_CORE = (
    "WITH toks AS (SELECT doc_id, {unnest} AS tok FROM documents), "
    "df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok), "
    "nd AS (SELECT COUNT(*) AS n_docs FROM documents), "
    "scored AS (SELECT doc_id, "
    "           CAST(n_docs * 1000 {idiv} df AS BIGINT) AS rar "
    "           FROM toks JOIN df USING (tok) CROSS JOIN nd) "
    "SELECT doc_id, CAST(SUM(rar) {idiv} COUNT(*) AS BIGINT) "
    "AS rarity_permille "
    "FROM scored GROUP BY doc_id ORDER BY doc_id"
)

_WINNOW_N, _WINNOW_W = 3, 4


def _winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import HASH_PRIME, token_id
    from ..functions.text import tokens, winnow_fingerprint

    docs = register_views(spark, sf_dir, DOCS)["documents"]
    tk = docs.select("doc_id", tokens("text").alias("toks")).where(
        F.size("toks") >= _WINNOW_N + _WINNOW_W - 1
    )
    fp = winnow_fingerprint(
        F.col("toks"),
        lambda s: token_id(s) % F.lit(HASH_PRIME),
        n=_WINNOW_N,
        window=_WINNOW_W,
    )
    return tk.select(
        "doc_id",
        F.array_join(
            F.transform(fp, lambda x: x.cast("string")), ","
        ).alias("fp"),
        F.size(fp).alias("n_fp"),
    ).orderBy("doc_id")


def _winnow_oracle() -> str:
    from ..functions.hashing import HASH_PRIME

    n, w = _WINNOW_N, _WINNOW_W
    return (
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks "
        f"FROM documents WHERE len(string_split(text, ' ')) >= {n + w - 1}), "
        "h AS (SELECT doc_id, "
        f"list_transform(generate_series(1, len(toks) - {n - 1}), "
        f"i -> ('0x' || substr(md5(array_to_string(toks[i:i+{n - 1}], ' ')), "
        f"1, 15))::BIGINT % {HASH_PRIME}) AS hs FROM t), "
        "m AS (SELECT doc_id, list_sort(list_distinct("
        f"list_transform(generate_series(1, len(hs) - {w - 1}), "
        f"i -> list_min(hs[i:i+{w - 1}])))) AS fps FROM h) "
        "SELECT doc_id, "
        "array_to_string(list_transform(fps, x -> CAST(x AS VARCHAR)), ',') "
        "AS fp, "
        "CAST(len(fps) AS INT) AS n_fp "
        "FROM m ORDER BY doc_id"
    )


df_query(
    "text_winnow",
    _winnow,
    oracle=_winnow_oracle(),
    tables=DOCS,
    tags=("text", "fingerprint", "winnowing"),
    doc="winnowing fingerprint sets (rolling min over shingle hashes, "
    "MOSS-style): guaranteed detection of shared token runs at ~1/w storage",
)


# BPE-ish sub-word segmentation: letter runs / digit runs / single
# punctuation as separate pieces (the pre-tokenization regex shape GPT-2
# style BPE uses before merges). Pure POSIX classes so Spark (Java regex)
# and DuckDB (RE2) agree.
_BPE_PAT = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

sql_query(
    "text_token_bpe",
    "SELECT doc_id, "
    f"CAST(size(regexp_extract_all(text, '{_BPE_PAT}', 0)) AS BIGINT) "
    "AS n_pieces, "
    "CAST(size(split(text, ' ')) AS BIGINT) AS n_words, "
    f"CAST(size(regexp_extract_all(text, '{_BPE_PAT}', 0)) * 1000 "
    "     DIV size(split(text, ' ')) AS BIGINT) AS pieces_per_kword "
    "FROM documents ORDER BY doc_id",
    oracle=(
        "SELECT doc_id, "
        f"CAST(len(regexp_extract_all(text, '{_BPE_PAT}')) AS BIGINT) "
        "AS n_pieces, "
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words, "
        f"CAST(len(regexp_extract_all(text, '{_BPE_PAT}')) * 1000 "
        "     // len(string_split(text, ' ')) AS BIGINT) AS pieces_per_kword "
        "FROM documents ORDER BY doc_id"
    ),
    tables=DOCS,
    tags=("text", "tokenize"),
    doc="BPE-ish sub-word piece counting (regex pre-tokenizer; north-star "
    "token-counting tier alongside the whitespace counter)",
)

sql_query(
    "text_rarity_score",
    _RARITY_CORE.format(unnest="explode(split(text, ' '))", idiv="DIV"),
    oracle=_RARITY_CORE.format(
        unnest="unnest(string_split(text, ' '))", idiv="//"
    ),
    tables=DOCS,
    tags=("text", "quality"),
    doc="doc-level mean token rarity (integer permille; df-based novelty score)",
)


# within-doc repetition ratio (Gopher/RefinedWeb-style quality gate): the
# fraction of tokens that are repeats of an earlier token in the same doc.
# High permille = templated/spammy text. Pure array built-ins, no explode:
# one scan, no shuffle at all.
sql_query(
    "text_rep_ratio",
    "SELECT doc_id, "
    "CAST((size(l) - size(array_distinct(l))) * 1000 DIV size(l) AS BIGINT) "
    "AS rep_permille "
    "FROM (SELECT doc_id, split(text, ' ') AS l FROM documents) t "
    "ORDER BY doc_id",
    oracle=(
        "SELECT doc_id, "
        "CAST((len(l) - len(list_distinct(l))) * 1000 // len(l) AS BIGINT) "
        "AS rep_permille "
        "FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents) t "
        "ORDER BY doc_id"
    ),
    tables=DOCS,
    tags=("text", "quality"),
    doc="within-doc token-repetition permille (templated-text quality gate; "
    "shuffle-free array built-ins)",
)

# benchmark decontamination: flag corpus docs sharing any 8-token run with
# the holdout set (doc_id % 10 == 0 stands in for the benchmark). The
# holdout shingle-hash set is orders of magnitude smaller than the corpus,
# so the membership probe is a broadcast-able semi-join keyed on the hash —
# at 100 TB the corpus side streams through one equi-join, never a scan of
# holdout text per doc.
_DECON_SPARK = (
    "WITH toks AS (SELECT doc_id, split(text, ' ') AS l FROM documents "
    "              WHERE size(split(text, ' ')) >= 8), "
    "sh AS (SELECT doc_id, explode(transform(sequence(1, size(l) - 7), "
    "       i -> concat_ws(' ', slice(l, i, 8)))) AS s FROM toks), "
    "ids AS (SELECT DISTINCT doc_id, md5(s) AS h FROM sh), "
    "hold AS (SELECT DISTINCT h FROM ids WHERE doc_id % 10 = 0) "
    "SELECT i.doc_id, COUNT(*) AS n_shared FROM ids i JOIN hold USING (h) "
    "WHERE i.doc_id % 10 <> 0 GROUP BY i.doc_id ORDER BY i.doc_id"
)

sql_query(
    "text_decontaminate",
    _DECON_SPARK,
    oracle=(
        "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l "
        "              FROM documents "
        "              WHERE len(string_split(text, ' ')) >= 8), "
        "sh AS (SELECT doc_id, unnest(list_transform("
        "       generate_series(1, len(l) - 7), "
        "       i -> array_to_string(l[i:i+7], ' '))) AS s FROM toks), "
        "ids AS (SELECT DISTINCT doc_id, md5(s) AS h FROM sh), "
        "hold AS (SELECT DISTINCT h FROM ids WHERE doc_id % 10 = 0) "
        "SELECT i.doc_id, COUNT(*) AS n_shared FROM ids i JOIN hold USING (h) "
        "WHERE i.doc_id % 10 <> 0 GROUP BY i.doc_id ORDER BY i.doc_id"
    ),
    tables=DOCS,
    tags=("text", "decontamination", "dedup"),
    doc="benchmark decontamination: corpus docs sharing an 8-token run with "
    "the holdout set (hash semi-join; GPT-3-style n-gram overlap check)",
)


def _lang_confusion_sql(size_fn: str, filter_fn: str, split_fn: str) -> str:
    """Label-noise audit: confusion matrix of the labeled lang column vs
    the n-gram langid prediction — the cross-lingual-contamination check a
    curation pipeline runs before trusting per-language mix weights. One
    scan + one hash agg over the langid scoring projection."""
    inner = _langid_sql(size_fn, filter_fn, split_fn)
    return (
        f"WITH pred AS ({inner.replace(' ORDER BY doc_id', '')}) "
        "SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(CASE WHEN lang = pred_lang THEN 1 ELSE 0 END) AS BIGINT) "
        "  AS n_agree "
        "FROM pred GROUP BY lang, pred_lang ORDER BY lang, pred_lang"
    )


sql_query(
    "text_lang_confusion",
    _lang_confusion_sql("size", "filter", "split"),
    oracle=_lang_confusion_sql("len", "list_filter", "string_split"),
    tables=DOCS,
    tags=("text", "langid", "quality"),
    doc="labeled-vs-predicted language confusion matrix (label-noise / "
    "cross-lingual contamination audit)",
)


def _sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import weighted_sample

    docs = register_views(spark, sf_dir, DOCS)["documents"]
    # weight = distinct-token ratio in permille, capped at 900: the soft
    # quality signal (low-diversity docs keep a small but nonzero chance)
    w = F.expr(
        "least(900, size(array_distinct(split(text, ' '))) * 1000 "
        "DIV size(split(text, ' ')))"
    )
    kept = weighted_sample(docs.withColumn("w", w), "doc_id", "w")
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.expr("CAST(sum(w) DIV count(*) AS BIGINT)").alias(
                "mean_w_permille"
            ),
        )
        .orderBy("lang")
    )


df_query(
    "sample_weighted",
    _sample_weighted,
    oracle=(
        "WITH w AS (SELECT doc_id, lang, "
        "  LEAST(900, len(list_distinct(string_split(text, ' '))) * 1000 "
        "        // len(string_split(text, ' '))) AS w "
        "  FROM documents) "
        "SELECT lang, COUNT(*) AS n_kept, "
        "CAST(SUM(w) // COUNT(*) AS BIGINT) AS mean_w_permille FROM w "
        "WHERE (('0x' || substr(md5(concat('v1:', CAST(doc_id AS VARCHAR)))"
        ",1,15))::BIGINT % 1000) < w "
        "GROUP BY lang ORDER BY lang"
    ),
    tables=DOCS,
    tags=("sampling", "quality", "weighted"),
    doc="quality-weighted sampling: keep probability = per-doc distinct-"
    "token permille (capped 900) — soft curation via stable hash bucket",
)


# ---- bigram-LM fluency score ----------------------------------------------


_bigram_cache = CacheSlot()


def _bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based bigram language-model quality proxy, integer-exact.

    The KenLM-shaped fluency gate of a curation pipeline, restated so the
    oracle can hash it: corpus-wide MLE conditional probability
    P(w2|w1) = C(w1 w2) / Σ_w' C(w1 w'), floored to permille per bigram
    occurrence, then floor-averaged per document (the denominator is the
    textbook row-normalizer — counts of w1 in NON-FINAL positions — so
    each prefix's probabilities sum to ~1). Low scores flag unnatural
    token streams (boilerplate, shredded markup, gibberish) exactly like
    a real LM perplexity filter — with counts instead of backoff weights.

    Scale shape: ONE corpus tokenization pass (the per-occurrence bigram
    frame is persisted and feeds the bigram counts, the prefix counts and
    the verify join), two vocab-bound hash aggregations, two equi-joins
    keyed on 60-bit hashes — fixed-width BIGINT shuffles, no strings on
    the wire after the hash projection; AQE broadcasts the count tables
    iff they measure small. No UDFs, whole-stage codegen throughout.
    Measured 2.3 s -> 1.4 s at sf0.1 vs the tokenize-three-times form.
    """
    from ..functions.hashing import token_id
    from ..functions.text import shingles, tokens

    _bigram_cache.release()
    docs = register_views(spark, sf_dir, ("documents",))["documents"]
    tk = docs.select("doc_id", tokens("text").alias("toks")).where(
        F.size("toks") >= 2
    )
    # per-OCCURRENCE bigrams (no distinct: frequency is the signal here);
    # three consumers -> lazy persist (measured vs eager at sf0.1:
    # 1.4 s vs 1.6 s min-of-N; the count-agg stages serialize enough that
    # the first fill wins the race, unlike the minhash pipeline)
    bgo = _bigram_cache.hold(
        tk.select(
            "doc_id",
            F.explode(shingles(F.col("toks"), 2)).alias("s"),
        ).select(
            "doc_id",
            token_id(F.col("s")).alias("bid"),
            token_id(F.split(F.col("s"), " ")[0]).alias("wid"),
        ),
        materialize=False,
    )
    uni = bgo.groupBy("wid").agg(F.count("*").alias("c1"))
    big = bgo.groupBy("bid").agg(F.count("*").alias("c2"))
    return (
        bgo.join(big, "bid")
        .join(uni, "wid")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.expr("SUM(c2 * 1000 DIV c1) DIV COUNT(*)").alias("lm_permille"),
        )
        .orderBy("doc_id")
    )


from ..functions.hashing import token_id_sql_duck as _tid  # noqa: E402

_WID_EXPR = _tid("string_split(s, ' ')[1]")

df_query(
    "text_bigram_lm",
    _bigram_lm,
    oracle=(
        "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l "
        "              FROM documents WHERE len(string_split(text, ' ')) >= 2), "
        "bg AS (SELECT doc_id, unnest(list_transform("
        "       generate_series(1, len(l)-1), "
        "       i -> array_to_string(l[i:i+1], ' '))) AS s FROM toks), "
        f"bgo AS (SELECT doc_id, {_tid('s')} AS bid, "
        f"        {_WID_EXPR} AS wid FROM bg), "
        "uni AS (SELECT wid, COUNT(*) AS c1 FROM bgo GROUP BY wid), "
        "bc AS (SELECT bid, COUNT(*) AS c2 FROM bgo GROUP BY bid) "
        "SELECT doc_id, COUNT(*) AS n_bigrams, "
        "CAST(SUM(c2 * 1000 // c1) // COUNT(*) AS BIGINT) AS lm_permille "
        "FROM bgo JOIN bc USING (bid) JOIN uni USING (wid) "
        "GROUP BY doc_id ORDER BY doc_id"
    ),
    tables=("documents",),
    tags=("text", "quality", "lm"),
    doc="bigram-LM fluency score: corpus MLE P(w2|w1) floored to permille "
    "per occurrence, floor-averaged per doc — the count-based analogue of "
    "a perplexity quality filter, hash-exact on both engines",
)


# ---- char-trigram language-ID (self-trained profiles) ----------------------


def _langid_ngram_sql(dialect: str) -> str:
    """Real n-gram language-ID shape: per-language char-trigram profiles
    TRAINED FROM THE CORPUS (top-20 trigrams by frequency, deterministic
    tie-break), docs scored by profile-hit occurrences, argmax with
    stable tie-break, rolled up into the confusion matrix.

    Scale: trigram explode is map-side; profiles are a vocab-bound agg +
    top-20 window over (lang, trigram) counts; doc scoring is one
    equi-join on the trigram string. No per-row Python anywhere.
    """
    if dialect == "spark":
        # REPARTITION(__PAR__): the corpus scan is one task at bench file sizes
        # and AQE coalesces tiny-byte/huge-CPU stages back to 1 partition
        # (it sizes by bytes) — the explicit width keeps the trigram
        # explode parallel (measured 3.96 s -> 2.74 s at sf0.1); on a real
        # many-split table the exchange is one narrow pass of raw text
        tri = (
            "SELECT doc_id, lang, explode(transform("
            "sequence(1, length(text) - 2), i -> substring(text, i, 3))) AS t "
            "FROM (SELECT /*+ REPARTITION(__PAR__) */ * FROM documents) "
            "WHERE length(text) >= 3"
        )
    else:
        tri = (
            "SELECT doc_id, lang, unnest(list_transform("
            "generate_series(1, length(text) - 2), i -> text[i:i+2])) AS t "
            "FROM documents WHERE length(text) >= 3"
        )
    return (
        f"WITH tri AS ({tri}), "
        "prof AS (SELECT plang, t FROM ("
        "  SELECT lang AS plang, t, ROW_NUMBER() OVER (PARTITION BY lang "
        "    ORDER BY COUNT(*) DESC, t) AS rn "
        "  FROM tri GROUP BY lang, t) p WHERE rn <= 20), "
        "sc AS (SELECT d.doc_id, p.plang, COUNT(*) AS s "
        "       FROM tri d JOIN prof p ON d.t = p.t GROUP BY 1, 2), "
        "best AS (SELECT doc_id, plang, ROW_NUMBER() OVER ("
        "  PARTITION BY doc_id ORDER BY s DESC, plang) AS rn FROM sc), "
        "pred AS (SELECT doc_id, plang AS pred_lang FROM best WHERE rn = 1) "
        "SELECT l.lang, COALESCE(p.pred_lang, 'none') AS pred_lang, "
        "COUNT(*) AS n "
        "FROM documents l LEFT JOIN pred p ON l.doc_id = p.doc_id "
        "GROUP BY 1, 2 ORDER BY 1, 2"
    )


sql_query(
    "text_langid_ngram",
    _langid_ngram_sql("spark"),
    oracle=_langid_ngram_sql("duck"),
    tables=DOCS,
    tags=("text", "langid", "ngram"),
    doc="char-trigram language-ID: per-lang top-20 trigram profiles "
    "trained from the corpus, occurrence-count scoring, stable argmax -> "
    "confusion matrix vs the declared lang — the faithful n-gram LID "
    "shape (upgrades the marker-token stand-in of text_langid)",
)


# ---- URL extraction / domain mix -------------------------------------------


def _urls_sql(dialect: str) -> str:
    """Domain-mix analysis — the per-domain quota input every crawl
    pipeline needs. The fixture corpus carries no URLs, so deterministic
    URLs are synthesized per doc (same certification pattern as
    text_scrub_pii): doc_id picks one of 7 hosts, some with www/mixed
    case to exercise normalization. Extract host via ERE, normalize
    (lowercase, strip leading www.), count docs per domain.
    """
    hosts = (
        "CASE CAST(doc_id % 7 AS INT) "
        "WHEN 0 THEN 'docs.example.org' WHEN 1 THEN 'WWW.News.Example.com' "
        "WHEN 2 THEN 'blog.example.net' WHEN 3 THEN 'www.wiki.example.org' "
        "WHEN 4 THEN 'Forum.Example.com' WHEN 5 THEN 'docs.example.org' "
        "ELSE 'archive.example.net' END"
    )
    extract = "regexp_extract(raw, 'https?://([^/ ]+)/', 1)"
    if dialect == "spark":
        strip_www = "regexp_replace(lower(h), '^www\\\\.', '')"
        idstr = "CAST(doc_id AS STRING)"
    else:
        strip_www = "regexp_replace(lower(h), '^www\\.', '')"
        idstr = "CAST(doc_id AS VARCHAR)"
    return (
        f"WITH r AS (SELECT doc_id, CONCAT('see https://', {hosts}, "
        f"           '/p/', {idstr}, ' ', text) AS raw "
        "           FROM documents), "
        f"h AS (SELECT doc_id, {extract} AS h FROM r), "
        f"d AS (SELECT doc_id, {strip_www} AS domain FROM h) "
        "SELECT domain, COUNT(*) AS n_docs FROM d "
        "GROUP BY domain ORDER BY domain"
    )


sql_query(
    "text_domain_mix",
    _urls_sql("spark"),
    oracle=_urls_sql("duck"),
    tables=DOCS,
    tags=("text", "url", "domains"),
    doc="URL extraction + domain normalization + per-domain doc counts "
    "(synthesized deterministic URLs, same certification pattern as "
    "text_scrub_pii) — the domain-quota input of a crawl pipeline",
)


# ---- decontamination spans -------------------------------------------------


def _decon_spans_sql(dialect: str) -> str:
    """text_decontaminate's actionable extension: WHERE the contaminated
    8-gram runs sit in each flagged doc, so the excision step can cut
    spans instead of dropping whole documents. Per-occurrence positions
    (no DISTINCT before the join); the span summary is the editor input.
    """
    if dialect == "spark":
        occ = (
            "SELECT doc_id, pos, md5(concat_ws(' ', slice(l, pos, 8))) AS h "
            "FROM toks LATERAL VIEW explode(sequence(1, size(l) - 7)) t AS pos"
        )
        toks = (
            "SELECT doc_id, split(text, ' ') AS l FROM documents "
            "WHERE size(split(text, ' ')) >= 8"
        )
    else:
        occ = (
            "SELECT doc_id, i AS pos, md5(array_to_string(l[i:i+7], ' ')) AS h "
            "FROM toks, unnest(generate_series(1, len(l) - 7)) AS t(i)"
        )
        toks = (
            "SELECT doc_id, string_split(text, ' ') AS l FROM documents "
            "WHERE len(string_split(text, ' ')) >= 8"
        )
    return (
        f"WITH toks AS ({toks}), "
        f"occ AS ({occ}), "
        "hold AS (SELECT DISTINCT h FROM occ WHERE doc_id % 10 = 0), "
        "hits AS (SELECT o.doc_id, o.pos FROM occ o JOIN hold USING (h) "
        "         WHERE o.doc_id % 10 <> 0) "
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits, "
        "CAST(MIN(pos) AS BIGINT) AS first_pos, "
        "CAST(MAX(pos) AS BIGINT) AS last_pos, "
        "CAST(MAX(pos) + 7 - MIN(pos) + 1 AS BIGINT) AS span_tokens "
        "FROM hits GROUP BY doc_id ORDER BY doc_id"
    )


sql_query(
    "text_decontaminate_spans",
    _decon_spans_sql("spark"),
    oracle=_decon_spans_sql("duck"),
    tables=DOCS,
    tags=("text", "decontamination", "dedup"),
    doc="decontamination spans: per flagged doc, position and extent of "
    "the holdout-overlapping 8-gram runs — the excision-step input "
    "(cut the span, keep the doc) extending text_decontaminate",
)


# Zipf rank-frequency check: in a natural corpus rank*frequency is
# roughly constant over the head ranks; synthetic or templated text
# breaks the law loudly. Emitted as the permille spread of rank*freq
# across the top-20 token ranks plus the head products — an integer
# corpus-health gauge (no logs/floats needed for the constancy test).
sql_query(
    "text_zipf_check",
    "WITH tf AS (SELECT w, COUNT(*) AS f FROM ("
    "  SELECT explode(split(text, ' ')) AS w FROM documents) x GROUP BY w), "
    "ranked AS (SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, w) AS r "
    "  FROM tf), "
    "head AS (SELECT r, f, r * f AS rf FROM ranked WHERE r <= 20) "
    "SELECT CAST(MIN(rf) AS BIGINT) AS min_rf, "
    "CAST(MAX(rf) AS BIGINT) AS max_rf, "
    "CAST(SUM(rf) DIV COUNT(*) AS BIGINT) AS mean_rf, "
    "CAST((MAX(rf) - MIN(rf)) * 1000 DIV "
    "  (CASE WHEN SUM(rf) = 0 THEN 1 ELSE SUM(rf) DIV COUNT(*) END) "
    "  AS BIGINT) AS spread_permille "
    "FROM head",
    oracle=(
        "WITH tf AS (SELECT w, COUNT(*) AS f FROM ("
        "  SELECT unnest(string_split(text, ' ')) AS w FROM documents) x "
        "  GROUP BY w), "
        "ranked AS (SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, w) AS r "
        "  FROM tf), "
        "head AS (SELECT r, f, r * f AS rf FROM ranked WHERE r <= 20) "
        "SELECT CAST(MIN(rf) AS BIGINT) AS min_rf, "
        "CAST(MAX(rf) AS BIGINT) AS max_rf, "
        "CAST(SUM(rf) // COUNT(*) AS BIGINT) AS mean_rf, "
        "CAST((MAX(rf) - MIN(rf)) * 1000 // "
        "  (CASE WHEN SUM(rf) = 0 THEN 1 ELSE SUM(rf) // COUNT(*) END) "
        "  AS BIGINT) AS spread_permille "
        "FROM head"
    ),
    tables=("documents",),
    tags=("text", "quality", "zipf"),
    doc="Zipf rank-frequency constancy over the top-20 token ranks: "
    "min/max/mean of rank*freq + spread permille — the templated-text "
    "tripwire, integer arithmetic only",
)


# ---- held-out trigram LM with stupid backoff -------------------------------
# The real perplexity-filter shape (upgrades text_bigram_lm's in-corpus
# MLE): the LM trains on the TRAIN hash-split only, scores VAL docs, and
# unseen trigrams back off (Brants et al. 2007 "stupid backoff", alpha =
# 0.4 -> integer 400-permille multiply):
#     S(w3|w1w2) = c3/c2           if the trigram was seen in train
#                = 0.4 * c(w2w3)/c(w2)   else if the bigram was seen
#                = 0                      else
# All floors-last integer permille, so the verdict is hash-exact. Scale:
# the count tables are hash aggs over train trigrams; scoring is three
# LEFT equi-joins from the val trigram stream - no window, no cartesian.


def _trigram_lm_sql(dialect: str) -> str:
    if dialect == "spark":
        idiv = "DIV"
        toks = (
            "SELECT doc_id, split(text, ' ') AS l, "
            "CASE WHEN (CAST(conv(substr(md5(concat('v1:', "
            "CAST(doc_id AS STRING))),1,15),16,10) AS BIGINT) % 1000) < 800 "
            "THEN 'train' ELSE 'val' END AS split "
            "FROM (SELECT /*+ REPARTITION(__PAR__) */ * FROM documents) "
            "WHERE size(split(text, ' ')) >= 3"
        )
        tg = (
            "SELECT doc_id, split, element_at(l, i) AS w1, "
            "element_at(l, i + 1) AS w2, element_at(l, i + 2) AS w3 "
            "FROM (SELECT doc_id, split, l, "
            "      explode(sequence(1, size(l) - 2)) AS i FROM toks) x"
        )
    else:
        idiv = "//"
        toks = (
            "SELECT doc_id, string_split(text, ' ') AS l, "
            "CASE WHEN (('0x' || substr(md5('v1:' || "
            "CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 1000) < 800 "
            "THEN 'train' ELSE 'val' END AS split "
            "FROM documents WHERE len(string_split(text, ' ')) >= 3"
        )
        tg = (
            "SELECT doc_id, split, l[i] AS w1, l[i + 1] AS w2, l[i + 2] AS w3 "
            "FROM (SELECT doc_id, split, l, "
            "      unnest(generate_series(1, len(l) - 2)) AS i FROM toks) x"
        )
    return (
        f"WITH toks AS ({toks}), "
        f"tg AS ({tg}), "
        "c3 AS (SELECT w1, w2, w3, COUNT(*) AS c3 FROM tg "
        "       WHERE split = 'train' GROUP BY 1, 2, 3), "
        "c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM tg "
        "       WHERE split = 'train' GROUP BY 1, 2), "
        "b2 AS (SELECT w2, w3, COUNT(*) AS b2 FROM tg "
        "       WHERE split = 'train' GROUP BY 1, 2), "
        "b1 AS (SELECT w2, COUNT(*) AS b1 FROM tg "
        "       WHERE split = 'train' GROUP BY 1), "
        "scored AS (SELECT v.doc_id, "
        "  CASE WHEN c3.c3 IS NOT NULL THEN "
        f"    c3.c3 * 1000 {idiv} c2.c2 "
        "  WHEN b2.b2 IS NOT NULL THEN "
        f"    400 * (b2.b2 * 1000 {idiv} b1.b1) {idiv} 1000 "
        "  ELSE 0 END AS s "
        "  FROM tg v "
        "  LEFT JOIN c3 ON v.w1 = c3.w1 AND v.w2 = c3.w2 AND v.w3 = c3.w3 "
        "  LEFT JOIN c2 ON v.w1 = c2.w1 AND v.w2 = c2.w2 "
        "  LEFT JOIN b2 ON v.w2 = b2.w2 AND v.w3 = b2.w3 "
        "  LEFT JOIN b1 ON v.w2 = b1.w2 "
        "  WHERE v.split = 'val') "
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams, "
        f"CAST(SUM(s) {idiv} COUNT(*) AS BIGINT) AS lm3_permille "
        "FROM scored GROUP BY doc_id ORDER BY doc_id"
    )


sql_query(
    "text_trigram_backoff_lm",
    _trigram_lm_sql("spark"),
    oracle=_trigram_lm_sql("duck"),
    tables=DOCS,
    tags=("text", "quality", "lm", "backoff"),
    doc="held-out trigram LM fluency with stupid backoff (alpha=0.4, "
    "Brants 2007): counts fit on the train hash-split only, val docs "
    "scored per trigram occurrence with integer-permille backoff chain "
    "- the count-based perplexity filter over genuinely unseen text",
)


# Kneser-Ney smoothed bigram LM (Chen & Goodman 1998, the estimator the
# backoff LMs above approximate): absolute discounting with a
# CONTINUATION-count unigram backoff —
#     P_KN(w|v) = max(c(vw) - D, 0)/c(v·) + D·N1+(v·)/c(v·) · N1+(·w)/Nt
# with D = 3/4 (the canonical fixed discount), N1+(v·) the count of
# distinct continuations of v, N1+(·w) the count of distinct contexts
# preceding w, and Nt the total bigram-type count. Scaling every term by
# 4 clears the fraction into ONE integer rational:
#     P_KN = [max(4c - 3, 0)·Nt + 3·N1+(v·)·N1+(·w)] / [4·c(v·)·Nt]
# so the floor-ppm projection is hash-exact on both engines — the
# textbook float spelling is not certifiable, this one is. Per-context
# probabilities sum to exactly 1 in rationals (pinned by unit test with
# fractions.Fraction). Scale shape: two hash aggregates over the bigram
# stream + three dim-sized count frames broadcast into the scoring join;
# distributed top-k (LIMIT before ROW_NUMBER, the PMI idiom). Integer
# domain: products stay in BIGINT while c(v·)·Nt < 2^43-ish — fixture
# scales are orders of magnitude inside; a 100 TB corpus takes the same
# shard-then-merge treatment as the BM25 postings (per-shard counts,
# rational folded after the merge).

_KN_TOPK = 20


def _kneser_ney_sql(dialect: str) -> str:
    if dialect == "spark":
        idiv = "DIV"
        bg = (
            "SELECT explode(transform(sequence(1, size(l) - 1), "
            "i -> struct(element_at(l, i) AS v, element_at(l, i + 1) "
            "AS w))) AS p "
            "FROM (SELECT split(text, ' ') AS l FROM documents) d "
            "WHERE size(l) >= 2"
        )
    else:
        idiv = "//"
        bg = (
            "SELECT unnest(list_transform(generate_series(1, len(l) - 1), "
            "i -> {'v': l[i], 'w': l[i+1]})) AS p "
            "FROM (SELECT string_split(text, ' ') AS l FROM documents) d "
            "WHERE len(l) >= 2"
        )
    return (
        f"WITH pairs AS (SELECT p.v AS v, p.w AS w FROM ({bg}) b), "
        "c2 AS (SELECT v, w, COUNT(*) AS c FROM pairs GROUP BY v, w), "
        # context totals + distinct-continuation counts, one pass over c2
        "cv AS (SELECT v, SUM(c) AS cv, COUNT(*) AS n1v FROM c2 GROUP BY v), "
        "cw AS (SELECT w, COUNT(*) AS n1w FROM c2 GROUP BY w), "
        "nt AS (SELECT COUNT(*) AS nt FROM c2), "
        "kn AS (SELECT c2.v, c2.w, c2.c, "
        "CAST((1000000 * (GREATEST(4 * c2.c - 3, 0) * nt.nt "
        "+ 3 * cv.n1v * cw.n1w)) "
        f"{idiv} (4 * cv.cv * nt.nt) AS BIGINT) AS kn_ppm "
        "FROM c2 JOIN cv ON cv.v = c2.v JOIN cw ON cw.w = c2.w "
        "CROSS JOIN nt), "
        "sel AS (SELECT v, w, c, kn_ppm FROM kn "
        f"ORDER BY kn_ppm DESC, v, w LIMIT {_KN_TOPK}) "
        "SELECT v, w, CAST(c AS BIGINT) AS n_pair, kn_ppm, "
        "CAST(ROW_NUMBER() OVER (ORDER BY kn_ppm DESC, v, w) AS INT) "
        "AS rnk FROM sel ORDER BY rnk"
    )


sql_query(
    "text_kneser_ney_bigrams",
    _kneser_ney_sql("spark"),
    oracle=_kneser_ney_sql("duck"),
    tables=DOCS,
    tags=("text", "lm", "kneser-ney", "smoothing", "topk"),
    doc=f"top-{_KN_TOPK} bigrams by Kneser-Ney smoothed probability "
    "(Chen & Goodman absolute discounting D=3/4 with continuation-count "
    "backoff) as ONE exact integer rational floored to ppm — the "
    "estimator the stupid-backoff tier approximates, hash-exact where "
    "the float textbook spelling is not; per-context rational "
    "probabilities sum to exactly 1 (unit-pinned)",
)


# ---- per-document Kneser-Ney cross-entropy (held-out) -----------------------

# The measure side the CCNet tier below consumes, under the PRINCIPLED
# estimator: fit the KN bigram model on the train hash-split, score each
# VAL document's bigram stream, and report cross-entropy in exact
# fixed-point milli-bits per bigram. log2 of the KN rational num/den
# (the same single-fraction clearing as text_kneser_ney_bigrams) is
# lg_fp(den) - lg_fp(num) via the digit-by-digit integer log
# (functions/intlog.py) — both engines compute bit-identical values, so
# the per-doc score AND the head/middle/tail tercile are hash-exact
# where a float log-sum could flip a bucket boundary. Backoff
# conventions, pinned identically on both engines: context never seen
# in train -> one quantum of the uniform-ish floor 1/(4*Nt); seen
# context with a zero numerator (pair unseen AND w never a continuation
# anywhere) -> one quantum of that context's denominator 1/(4*c(v.)*Nt).
# Scale shape: count frames are hash aggregates over train bigrams and
# broadcast into the val scoring join; the log chain runs over the
# DISTINCT (num, den) value frame only (counts repeat massively, so the
# frame is far smaller than the stream); per-doc reduce is one hash
# agg; the tercile is a window over doc-level rows. BIGINT domain:
# num <= 4*c*Nt + 3*n1v*n1w needs c*Nt < 2^61 — per-shard counts at
# 100 TB take the same shard-then-merge treatment as the KN top-k.


def _kn_perplexity_sql(dialect: str) -> str:
    from ..functions.intlog import log2_fp_ctes

    if dialect == "spark":
        idiv = "DIV"
        toks = (
            "SELECT doc_id, split(text, ' ') AS l, "
            "CASE WHEN (CAST(conv(substr(md5(concat('v1:', "
            "CAST(doc_id AS STRING))),1,15),16,10) AS BIGINT) % 1000) < 800 "
            "THEN 'train' ELSE 'val' END AS split "
            "FROM (SELECT /*+ REPARTITION(__PAR__) */ * FROM documents) "
            "WHERE size(split(text, ' ')) >= 2"
        )
        bg = (
            "SELECT doc_id, split, element_at(l, i) AS v, "
            "element_at(l, i + 1) AS w "
            "FROM (SELECT doc_id, split, l, "
            "      explode(sequence(1, size(l) - 1)) AS i FROM toks) x"
        )
    else:
        idiv = "//"
        toks = (
            "SELECT doc_id, string_split(text, ' ') AS l, "
            "CASE WHEN (('0x' || substr(md5('v1:' || "
            "CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 1000) < 800 "
            "THEN 'train' ELSE 'val' END AS split "
            "FROM documents WHERE len(string_split(text, ' ')) >= 2"
        )
        bg = (
            "SELECT doc_id, split, l[i] AS v, l[i + 1] AS w "
            "FROM (SELECT doc_id, split, l, "
            "      unnest(generate_series(1, len(l) - 1)) AS i FROM toks) x"
        )
    return (
        f"WITH toks AS ({toks}), "
        f"bg AS ({bg}), "
        "c2 AS (SELECT v, w, COUNT(*) AS c FROM bg "
        "       WHERE split = 'train' GROUP BY v, w), "
        "cv AS (SELECT v, SUM(c) AS cv, COUNT(*) AS n1v FROM c2 GROUP BY v), "
        "cw AS (SELECT w, COUNT(*) AS n1w FROM c2 GROUP BY w), "
        "nt AS (SELECT COUNT(*) AS nt FROM c2), "
        "sc AS (SELECT b.doc_id, "
        "  CASE WHEN cv.v IS NULL THEN CAST(1 AS BIGINT) "
        "  ELSE GREATEST("
        "    GREATEST(4 * COALESCE(c2.c, 0) - 3, 0) * nt.nt "
        "    + 3 * cv.n1v * COALESCE(cw.n1w, 0), CAST(1 AS BIGINT)) "
        "  END AS num, "
        "  CASE WHEN cv.v IS NULL THEN 4 * nt.nt "
        "  ELSE 4 * cv.cv * nt.nt END AS den "
        "  FROM bg b "
        "  LEFT JOIN cv ON cv.v = b.v "
        "  LEFT JOIN c2 ON c2.v = b.v AND c2.w = b.w "
        "  LEFT JOIN cw ON cw.w = b.w "
        "  CROSS JOIN nt WHERE b.split = 'val'), "
        "vals AS (SELECT num AS vv FROM sc UNION SELECT den FROM sc), "
        + log2_fp_ctes("vals", "vv", "vv", "1", dialect, out="lg")
        + ", doc AS (SELECT sc.doc_id, "
        "  CAST(COUNT(*) AS BIGINT) AS n_bigrams, "
        "  SUM(ld.lg_fp - ln_.lg_fp) AS bits_fp "
        "  FROM sc JOIN lg ld ON ld.vv = sc.den "
        "  JOIN lg ln_ ON ln_.vv = sc.num GROUP BY sc.doc_id), "
        "scored AS (SELECT doc_id, n_bigrams, "
        f"  CAST((bits_fp * 1000) {idiv} (1024 * n_bigrams) AS BIGINT) "
        "  AS ce_mbits, "
        "  NTILE(3) OVER (ORDER BY (bits_fp * 1000) "
        f"    {idiv} (1024 * n_bigrams), doc_id) AS tier FROM doc) "
        "SELECT doc_id, n_bigrams, ce_mbits, "
        "CASE tier WHEN 1 THEN 'head' WHEN 2 THEN 'middle' "
        "ELSE 'tail' END AS bucket "
        "FROM scored ORDER BY doc_id"
    )


_kn_ppx_cache = CacheSlot()


def _kn_perplexity_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-frame spelling of the one-shot SQL (r14 opt).

    Spark inlines multiply-referenced CTEs, so the single-statement form
    re-planned the tokenize+explode subtree once per reference — the
    before-plan (plans/r14/text_perplexity_kn_before.txt) shows 42
    parquet scans / 42 Generates / 144 Exchanges for ONE query. The CTE
    text below is byte-identical to _kn_perplexity_sql('spark'); the only
    change is that the three multiply-consumed frames are persisted temp
    views, so each is computed once:
      kn_ppx_c2 — train bigram counts (was re-derived 4x: cv, cw, nt and
                  the val-scoring join);
      kn_ppx_sc — per-val-bigram (num, den) rationals (was re-derived 3x:
                  both vals arms + the doc roll-up); lazily held — the lg
                  materialization below fills it in-flight;
      kn_ppx_lg — the digit-by-digit log2 frame over DISTINCT rationals
                  (was re-derived 2x: the ld and ln_ joins).
    Three driver actions instead of one 42-scan job; values bit-identical
    (same fragments, same integer arithmetic, same NTILE ordering)."""
    from ..functions.intlog import log2_fp_ctes

    _kn_ppx_cache.release()
    register_views(spark, sf_dir, DOCS)
    par = spark.sparkContext.defaultParallelism
    # CTE-free nesting throughout: Spark 4.1's InlineCTE rule rejects
    # (PLAN_VALIDATION_FAILED_RULE_IN_BATCH) persisting a plan whose CTEs
    # nest a temp view over another lazily-persisted CTE plan, so the
    # shared frames are spelled as plain subqueries and each view is
    # referenced exactly ONCE downstream (the num/den unpivot below).
    toks = (
        "SELECT doc_id, split(text, ' ') AS l, "
        "CASE WHEN (CAST(conv(substr(md5(concat('v1:', "
        "CAST(doc_id AS STRING))),1,15),16,10) AS BIGINT) % 1000) < 800 "
        "THEN 'train' ELSE 'val' END AS split "
        f"FROM (SELECT /*+ REPARTITION({par}) */ * FROM documents) "
        "WHERE size(split(text, ' ')) >= 2"
    )
    bg = (
        "SELECT doc_id, split, element_at(l, i) AS v, "
        "element_at(l, i + 1) AS w "
        "FROM (SELECT doc_id, split, l, "
        f"      explode(sequence(1, size(l) - 1)) AS i FROM ({toks})) x"
    )
    c2 = spark.sql(
        f"SELECT v, w, COUNT(*) AS c FROM ({bg}) "
        "WHERE split = 'train' GROUP BY v, w"
    )
    _kn_ppx_cache.hold(c2)  # eager: 4 racing consumers in the sc build
    c2.createOrReplaceTempView("kn_ppx_c2")
    sc = spark.sql(
        "SELECT b.doc_id, "
        "  CASE WHEN cv.v IS NULL THEN CAST(1 AS BIGINT) "
        "  ELSE GREATEST("
        "    GREATEST(4 * COALESCE(c2.c, 0) - 3, 0) * nt.nt "
        "    + 3 * cv.n1v * COALESCE(cw.n1w, 0), CAST(1 AS BIGINT)) "
        "  END AS num, "
        "  CASE WHEN cv.v IS NULL THEN 4 * nt.nt "
        "  ELSE 4 * cv.cv * nt.nt END AS den "
        f"  FROM ({bg}) b "
        "  LEFT JOIN (SELECT v, SUM(c) AS cv, COUNT(*) AS n1v "
        "             FROM kn_ppx_c2 GROUP BY v) cv ON cv.v = b.v "
        "  LEFT JOIN kn_ppx_c2 c2 ON c2.v = b.v AND c2.w = b.w "
        "  LEFT JOIN (SELECT w, COUNT(*) AS n1w FROM kn_ppx_c2 "
        "             GROUP BY w) cw ON cw.w = b.w "
        "  CROSS JOIN (SELECT COUNT(*) AS nt FROM kn_ppx_c2) nt "
        "  WHERE b.split = 'val'"
    )
    _kn_ppx_cache.hold(sc, materialize=False)  # filled by the lg action
    sc.createOrReplaceTempView("kn_ppx_sc")
    # DISTINCT over an unpivot == the original num-UNION-den (set union)
    lg = spark.sql(
        "WITH vals AS (SELECT DISTINCT vv FROM "
        "  (SELECT explode(array(num, den)) AS vv FROM kn_ppx_sc)), "
        + log2_fp_ctes("vals", "vv", "vv", "1", "spark", out="lg")
        + " SELECT vv, lg_fp FROM lg"
    )
    _kn_ppx_cache.hold(lg)
    lg.createOrReplaceTempView("kn_ppx_lg")
    # unpivot each val bigram to (den,+1),(num,-1) so the log frame is
    # joined ONCE: SUM(s*lg_fp) == SUM(lg(den) - lg(num)) and every
    # num/den value joins by construction, so COUNT(*) DIV 2 == the
    # original per-doc bigram count — bit-identical, one join not two.
    return spark.sql(
        "WITH un AS (SELECT doc_id, e.s AS s, e.vv AS vv FROM "
        "  (SELECT doc_id, explode(array(named_struct('s', 1, 'vv', den), "
        "   named_struct('s', -1, 'vv', num))) AS e FROM kn_ppx_sc)), "
        "doc AS (SELECT u.doc_id, "
        "  CAST(COUNT(*) DIV 2 AS BIGINT) AS n_bigrams, "
        "  SUM(u.s * g.lg_fp) AS bits_fp "
        "  FROM un u JOIN kn_ppx_lg g ON g.vv = u.vv GROUP BY u.doc_id), "
        "scored AS (SELECT doc_id, n_bigrams, "
        "  CAST((bits_fp * 1000) DIV (1024 * n_bigrams) AS BIGINT) "
        "  AS ce_mbits, "
        "  NTILE(3) OVER (ORDER BY (bits_fp * 1000) "
        "    DIV (1024 * n_bigrams), doc_id) AS tier FROM doc) "
        "SELECT doc_id, n_bigrams, ce_mbits, "
        "CASE tier WHEN 1 THEN 'head' WHEN 2 THEN 'middle' "
        "ELSE 'tail' END AS bucket "
        "FROM scored ORDER BY doc_id"
    )


df_query(
    "text_perplexity_kn",
    _kn_perplexity_spark,
    oracle=_kn_perplexity_sql("duck"),
    tables=DOCS,
    tags=("text", "lm", "kneser-ney", "perplexity", "quality"),
    doc="held-out per-document cross-entropy (milli-bits/bigram) under "
    "the train-split Kneser-Ney bigram model, log2 of the exact KN "
    "rational via the digit-by-digit integer log — the CCNet measure "
    "side under the principled estimator, with hash-exact "
    "head/middle/tail terciles",
)


# ---- CCNet-style perplexity buckets + per-bucket sampling -------------------

# The CCNet curation recipe (Wenzek et al. 2020): score every doc with an
# LM, split the corpus into head/middle/tail perplexity terciles, then
# keep each tier at a different rate (head kept whole, tail subsampled
# hard). Restated count-exact: the bigram-MLE fluency score
# (text_bigram_lm's integer permille) ranks docs, NTILE(3) over the
# deterministic (score DESC, doc_id) order assigns tiers, and the keep
# decision is the canonical seeded permille hash — so the whole
# pipeline, sampling included, is replayed bit-exactly by the oracle.
#
# Scale: one tokenize pass, two vocab-bound count aggs, two hash-keyed
# equi-joins, ONE global window for the tercile split. The window's
# total sort is the one genuinely global stage — at 100 TB the tercile
# boundary would come from an approx-quantile pass over doc scores (the
# agg_quantile_sketch operator) instead of a full NTILE sort; tiles are
# certified here because they make the tier assignment hash-exact.


from ..functions.hashing import (  # noqa: E402
    bucket_sql_duck,
    bucket_sql_spark,
    token_id_sql_duck,
    token_id_sql_spark,
)


def _ccnet_score_ctes(dialect: str) -> tuple[str, str, str]:
    """(idiv, seeded keep-bucket expr, CTE text ending at ``sc``) — the
    shared bigram-MLE scoring pipeline both CCNet variants rank on."""
    if dialect == "spark":
        idiv = "DIV"
        tid = token_id_sql_spark
        bucket = bucket_sql_spark("doc_id", "ccnet1")
        toks = (
            "SELECT doc_id, split(text, ' ') AS l "
            "FROM (SELECT /*+ REPARTITION(__PAR__) */ * FROM documents) "
            "WHERE size(split(text, ' ')) >= 2"
        )
        bg = (
            "SELECT doc_id, element_at(l, i) AS w1, element_at(l, i + 1) AS w2 "
            "FROM (SELECT doc_id, l, "
            "      explode(sequence(1, size(l) - 1)) AS i FROM toks) x"
        )
    else:
        idiv = "//"
        tid = token_id_sql_duck
        bucket = bucket_sql_duck("doc_id", "ccnet1")
        toks = (
            "SELECT doc_id, string_split(text, ' ') AS l FROM documents "
            "WHERE len(string_split(text, ' ')) >= 2"
        )
        bg = (
            "SELECT doc_id, l[i] AS w1, l[i + 1] AS w2 "
            "FROM (SELECT doc_id, l, "
            "      unnest(generate_series(1, len(l) - 1)) AS i FROM toks) x"
        )
    bid = tid("concat(w1, ' ', w2)")
    ctes = (
        f"toks AS ({toks}), "
        f"bg AS ({bg}), "
        f"bgo AS (SELECT doc_id, {bid} AS bid, "
        f"        {tid('w1')} AS wid FROM bg), "
        "uni AS (SELECT wid, COUNT(*) AS c1 FROM bgo GROUP BY wid), "
        "bc AS (SELECT bid, COUNT(*) AS c2 FROM bgo GROUP BY bid), "
        "sc AS (SELECT doc_id, "
        f"       SUM(c2 * 1000 {idiv} c1) {idiv} COUNT(*) AS lm_permille "
        "       FROM bgo JOIN bc USING (bid) JOIN uni USING (wid) "
        "       GROUP BY doc_id)"
    )
    return idiv, bucket, ctes


def _ccnet_sql(dialect: str) -> str:
    idiv, bucket, ctes = _ccnet_score_ctes(dialect)
    return (
        f"WITH {ctes}, "
        "bkt AS (SELECT doc_id, lm_permille, "
        "        NTILE(3) OVER (ORDER BY lm_permille DESC, doc_id) AS t "
        "        FROM sc), "
        "named AS (SELECT doc_id, lm_permille, "
        "          CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' "
        "               ELSE 'tail' END AS bucket, "
        "          CASE t WHEN 1 THEN 1000 WHEN 2 THEN 500 "
        "               ELSE 100 END AS rate, "
        f"          {bucket} AS hb FROM bkt) "
        "SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(CASE WHEN hb < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, "
        f"CAST(SUM(lm_permille) {idiv} COUNT(*) AS BIGINT) AS avg_lm_permille "
        "FROM named GROUP BY bucket ORDER BY bucket"
    )


sql_query(
    "pipeline_ccnet_buckets",
    _ccnet_sql("spark"),
    oracle=_ccnet_sql("duck"),
    tables=DOCS,
    tags=("pipeline", "sampling", "lm"),
    doc="CCNet-style head/middle/tail perplexity terciles (bigram-MLE "
    "permille score, NTILE over deterministic order) with per-tier "
    "seeded keep rates 1000/500/100 permille - the classic LM-filtered "
    "corpus mix, sampling decision included in the certified output",
)


# The 100 TB spelling of the same tier split: pipeline_ccnet_buckets'
# NTILE needs one global row sort — the lone stage that doesn't scale.
# The score domain is BOUNDED INTEGERS (permille, <= ~1001 distinct
# values), so exact terciles come from a histogram instead: one
# corpus-linear groupBy(score) -> a <=1001-row cumulative frame -> value
# boundaries t1/t2 at the 1/3 and 2/3 cdf points. No row sort, no
# sketch, still hash-exact in both engines. Tier assignment is by VALUE
# (score <= t1 tail, <= t2 middle, else head), so tie mass can skew tier
# sizes off n/3 — the production-honest semantic (CCNet itself buckets
# by perplexity value); boundaries are emitted in the certified output.


def _ccnet_histq_sql(dialect: str) -> str:
    idiv, bucket, ctes = _ccnet_score_ctes(dialect)
    return (
        f"WITH {ctes}, "
        "hist AS (SELECT lm_permille AS s, COUNT(*) AS c FROM sc "
        "         GROUP BY lm_permille), "
        # the window orders the <=1001-row histogram, never corpus rows;
        # boundaries fold to ONE 1-row frame so the big side references
        # it exactly once via a broadcastable cross join (scalar
        # subqueries would inline the whole scoring pipeline per use)
        "cdf AS (SELECT s, c, SUM(c) OVER (ORDER BY s) AS cum FROM hist), "
        "tot AS (SELECT SUM(c) AS n FROM hist), "
        "b AS (SELECT MIN(CASE WHEN cum * 3 >= n THEN s END) AS t1, "
        "             MIN(CASE WHEN cum * 3 >= 2 * n THEN s END) AS t2 "
        "      FROM cdf CROSS JOIN tot), "
        "named AS (SELECT doc_id, lm_permille, t1, t2, "
        "          CASE WHEN lm_permille <= t1 THEN 'tail' "
        "               WHEN lm_permille <= t2 THEN 'middle' "
        "               ELSE 'head' END AS bucket, "
        "          CASE WHEN lm_permille <= t1 THEN 100 "
        "               WHEN lm_permille <= t2 THEN 500 "
        "               ELSE 1000 END AS rate, "
        f"          {bucket} AS hb FROM sc CROSS JOIN b) "
        "SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(CASE WHEN hb < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, "
        f"CAST(SUM(lm_permille) {idiv} COUNT(*) AS BIGINT) AS avg_lm_permille, "
        "CAST(MIN(t1) AS BIGINT) AS t1_permille, "
        "CAST(MIN(t2) AS BIGINT) AS t2_permille "
        "FROM named GROUP BY bucket ORDER BY bucket"
    )


sql_query(
    "pipeline_ccnet_histq",
    _ccnet_histq_sql("spark"),
    oracle=_ccnet_histq_sql("duck"),
    tables=DOCS,
    tags=("pipeline", "sampling", "lm", "scale"),
    doc="CCNet tier split, sort-free scale path: exact tercile "
    "boundaries from a bounded-integer score HISTOGRAM (one linear "
    "groupBy + a <=1001-row cumulative frame) instead of a global NTILE "
    "sort; value-based tier assignment with boundaries in the certified "
    "output — same keep rates, no global sort anywhere in the plan",
)


# Corpus-global boilerplate detection (the MassiveText/RefinedWeb repeated-
# template filter, reference-free analog of its "repeated lines across
# documents" rule): a fixed-width aligned 8-token segment that occurs in
# >= 2 DISTINCT documents anywhere in the corpus is boilerplate (cookie
# banners, nav bars, license headers — template text repeats verbatim
# wherever it lands, so the block key is global, not per-source). The
# fixture has no newlines, so the aligned segment stands in for the line;
# a real crawl swaps the segmenter, the operator shape is identical.
#
# Scale: segments are hashed to 60-bit ids INSIDE the transform, before
# the explode (doc_shingle_ids' trick — the shuffle carries fixed-width
# ints, never segment strings), then compacted to one row per (doc,
# segment) and CacheSlot-held: the repeated-segment dictionary, the
# per-source totals and the affected-doc rollup are three consumers of
# that ONE materialized frame — one tokenize+explode pass over the
# corpus, not three (a shared SQL CTE would be re-planned per consumer
# because each branch prunes different columns; the explicit hold is the
# Spark-idiomatic fix). The boilerplate id set is vocabulary-bound, so
# its join side broadcasts.

_BP_SEG = 8
_BP_MIN_DOCS = 2
_bp_cache = CacheSlot()


def _bp_segment_ids_expr() -> str:
    from ..functions.hashing import HASH_PRIME, token_id_sql_spark

    seg = f"concat_ws(' ', slice(l, i * {_BP_SEG} + 1, {_BP_SEG}))"
    return (
        f"transform(sequence(0, CAST((size(l) - {_BP_SEG}) DIV {_BP_SEG} AS INT)), "
        f"i -> {token_id_sql_spark(seg)} % {HASH_PRIME})"
    )


def _boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.spread import spread

    _bp_cache.release()
    docs = register_views(spark, sf_dir, DOCS)["documents"]
    seg = (
        spread(docs)
        .select("doc_id", "source", F.split("text", " ").alias("l"))
        .where(F.size("l") >= _BP_SEG)
        .select("doc_id", "source", F.explode(F.expr(_bp_segment_ids_expr())).alias("tid"))
    )
    pd = _bp_cache.hold(
        seg.groupBy("doc_id", "source", "tid").agg(F.count("*").alias("cnt"))
    )
    boiler = (
        pd.groupBy("tid")
        .agg(F.count("*").alias("ndocs"))  # pd is per-doc distinct already
        .where(F.col("ndocs") >= _BP_MIN_DOCS)
        .select("tid")
    )
    tot = pd.groupBy("source").agg(
        F.sum("cnt").alias("total_inst"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    hits = (
        pd.join(F.broadcast(boiler), "tid")
        .groupBy("source")
        .agg(
            F.sum("cnt").alias("binst"),
            F.countDistinct("doc_id").alias("affected"),
            F.countDistinct("tid").alias("n_seg"),
        )
    )
    return (
        tot.join(hits, "source", "left")
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.coalesce("n_seg", F.lit(0)).cast("long").alias("boiler_segments"),
            F.coalesce("affected", F.lit(0)).cast("long").alias("affected_docs"),
            F.expr("CAST(COALESCE(binst, 0) * 1000 DIV total_inst AS BIGINT)").alias(
                "boiler_permille"
            ),
        )
        .orderBy("source")
    )


def _boilerplate_oracle() -> str:
    from ..functions.hashing import HASH_PRIME, token_id_sql_duck

    return (
        "WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS l "
        "              FROM documents), "
        f"seg AS (SELECT doc_id, source, "
        f"        unnest(list_transform(generate_series(0, (len(l) - {_BP_SEG}) "
        f"        // {_BP_SEG}), i -> array_to_string("
        f"        l[i * {_BP_SEG} + 1 : i * {_BP_SEG} + {_BP_SEG}], ' '))) AS s "
        f"        FROM toks WHERE len(l) >= {_BP_SEG}), "
        f"ids AS (SELECT doc_id, source, {token_id_sql_duck('s')} "
        f"        % {HASH_PRIME} AS tid FROM seg), "
        "pd AS (SELECT doc_id, source, tid, COUNT(*) AS cnt "
        "       FROM ids GROUP BY doc_id, source, tid), "
        "dfc AS (SELECT tid, COUNT(*) AS ndocs FROM pd GROUP BY tid), "
        f"boiler AS (SELECT tid FROM dfc WHERE ndocs >= {_BP_MIN_DOCS}), "
        "tot AS (SELECT source, SUM(cnt) AS total_inst, "
        "        COUNT(DISTINCT doc_id) AS n_docs FROM pd GROUP BY source), "
        "hits AS (SELECT g.source, SUM(g.cnt) AS binst, "
        "         COUNT(DISTINCT g.doc_id) AS affected, "
        "         COUNT(DISTINCT g.tid) AS n_seg "
        "         FROM pd g JOIN boiler b ON g.tid = b.tid GROUP BY g.source) "
        "SELECT t.source, CAST(t.n_docs AS BIGINT) AS n_docs, "
        "CAST(COALESCE(h.n_seg, 0) AS BIGINT) AS boiler_segments, "
        "CAST(COALESCE(h.affected, 0) AS BIGINT) AS affected_docs, "
        "CAST(COALESCE(h.binst, 0) * 1000 // t.total_inst AS BIGINT) "
        "AS boiler_permille "
        "FROM tot t LEFT JOIN hits h ON t.source = h.source "
        "ORDER BY t.source"
    )


df_query(
    "text_boilerplate_segments",
    _boilerplate,
    oracle=_boilerplate_oracle(),
    tables=DOCS,
    tags=("text", "quality", "boilerplate", "dedup"),
    doc=f"corpus-global boilerplate report: aligned {_BP_SEG}-token segments "
    f"(60-bit-hashed pre-explode) repeated in >= {_BP_MIN_DOCS} distinct docs "
    "anywhere, rolled up per source (n_docs / repeated segments / affected "
    "docs / boilerplate permille of segment instances) - the repeated-"
    "template strip gate",
)


# DSIR-style data selection (Xie et al. 2023, "Data Selection for Language
# Models via Importance Resampling"): score every raw doc by how much its
# hashed-n-gram feature mass looks like a TARGET distribution (here: the
# lang='en' slice stands in for the high-quality target corpus), then keep
# the top scorers. The published method uses log-likelihood ratios of
# hashed n-gram counts; this integer-exact surrogate uses the add-one-
# smoothed count RATIO per bucket scaled to parts-per-million — same
# ordering signal for the common case, and bit-replayable by the oracle
# (floor DIV everywhere, no float log).
#
# Scale: ONE tokenize pass feeds a compact CacheSlot-held (doc, bucket,
# count) frame; the 256-bucket weight table (target and raw counted in
# the same agg via conditional sum) and the per-doc scoring join are two
# consumers of that one materialized frame, and the weight table joins
# back broadcast. SUM(w*cnt) DIV SUM(cnt) restates the instance-level
# mean over the compacted counts.

_DSIR_B = 256
_DSIR_SEED = "dsir1"
_DSIR_TOPN = 100
_dsir_cache = CacheSlot()


def _dsir_score_frame(docs: DataFrame, tokens: DataFrame | None = None) -> DataFrame:
    """(doc_id, dsir_score) over the full corpus — weights always come
    from the RAW distribution (DSIR's prescription), so composers that
    filter the corpus first still score against unfiltered counts.

    ``tokens``: an optional pre-split (doc_id, lang, l array<string>)
    frame (r15, guide §1.2/§2.4): composers that already tokenized the
    same corpus (the boilerplate gate's segment pass) hand the shared
    frame in, so ONE scan+split feeds both tokenizations instead of two.
    explode(l) over the split array is exactly explode(split(text)), so
    the bucket counts — and every downstream value — are unchanged.
    """
    from ..functions.hashing import bucket_sql_spark
    from ..functions.spread import spread

    _dsir_cache.release()
    base = (
        tokens
        if tokens is not None
        else spread(docs).select(
            "doc_id", "lang", F.split("text", " ").alias("l")
        )
    )
    tok = (
        base.select("doc_id", "lang", F.explode("l").alias("tok"))
        .select("doc_id", "lang", F.expr(bucket_sql_spark("tok", _DSIR_SEED, _DSIR_B)).alias("b"))
    )
    pd = _dsir_cache.hold(
        tok.groupBy("doc_id", "lang", "b").agg(F.count("*").alias("cnt"))
    )
    w = (
        pd.groupBy("b")
        .agg(
            F.sum("cnt").alias("rn"),
            F.sum(F.when(F.col("lang") == "en", F.col("cnt")).otherwise(0)).alias("tn"),
        )
        .select("b", F.expr("(tn + 1) * 1000000 DIV (rn + 1)").alias("w"))
    )
    return (
        pd.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(F.expr("CAST(SUM(w * cnt) DIV SUM(cnt) AS BIGINT)").alias("dsir_score"))
    )


def _dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = register_views(spark, sf_dir, DOCS)["documents"]
    return (
        _dsir_score_frame(docs)
        .join(docs.select("doc_id", "lang", "source"), "doc_id")
        .select("doc_id", "lang", "source", "dsir_score")
        .orderBy(F.desc("dsir_score"), "doc_id")
        .limit(_DSIR_TOPN)
    )


def _dsir_oracle() -> str:
    from ..functions.hashing import bucket_sql_duck

    bucket = bucket_sql_duck("tok", _DSIR_SEED, _DSIR_B)
    return (
        "WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) "
        "             AS tok FROM documents), "
        f"tb AS (SELECT doc_id, lang, {bucket} AS b FROM tok), "
        "pd AS (SELECT doc_id, lang, b, COUNT(*) AS cnt "
        "       FROM tb GROUP BY doc_id, lang, b), "
        "cnt AS (SELECT b, SUM(cnt) AS rn, "
        "        SUM(CASE WHEN lang = 'en' THEN cnt ELSE 0 END) AS tn "
        "        FROM pd GROUP BY b), "
        "w AS (SELECT b, (tn + 1) * 1000000 // (rn + 1) AS w FROM cnt), "
        "ds AS (SELECT doc_id, CAST(SUM(w.w * pd.cnt) // SUM(pd.cnt) "
        "       AS BIGINT) AS dsir_score "
        "       FROM pd JOIN w ON pd.b = w.b GROUP BY doc_id) "
        "SELECT d.doc_id, d.lang, d.source, s.dsir_score "
        "FROM ds s JOIN documents d ON s.doc_id = d.doc_id "
        f"ORDER BY s.dsir_score DESC, d.doc_id LIMIT {_DSIR_TOPN}"
    )


df_query(
    "pipeline_dsir_select",
    _dsir,
    oracle=_dsir_oracle(),
    tables=DOCS,
    tags=("pipeline", "sampling", "dsir", "text"),
    doc=f"DSIR-style importance selection: {_DSIR_B}-bucket hashed-unigram "
    "target-vs-raw count ratios (add-one smoothed, ppm integer), mean "
    f"bucket weight per doc, deterministic top-{_DSIR_TOPN} keep set "
    "(Xie et al. 2023 shape with integer-exact ratio weights)",
)


# The selection tier composed end-to-end (the counterpart of
# pipeline_end_to_end for the r8 selection family): per-doc boilerplate
# gate -> DSIR top-N keep -> leakage-free group-aware split. Certifies
# that the stages compose on the same corpus with no grain mismatch:
# boilerplate permille is re-derived per DOC from the same hashed
# segment frame the per-source report uses, DSIR weights come from the
# RAW corpus (filtering first would bias the denominator — DSIR's own
# prescription), and the final split keys on the canonicalized-content
# group so the kept set ships with its zero-leakage invariant as a
# certified column. Scale: each stage is the already-audited shape;
# composition adds two equi-joins on doc_id and nothing else.

_SC_MAX_BP = 500  # drop docs that are majority template text
_SC_TOPN = 200
_SC_SEED = "scsplit1"
_sc_cache = CacheSlot()
_sc_keep_cache = CacheSlot()


def _select_compose(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import bucket_sql_spark
    from ..functions.spread import spread
    from .extras import _NORM_SPARK

    _sc_cache.release()
    _sc_keep_cache.release()
    docs = register_views(spark, sf_dir, DOCS)["documents"]
    # r15 tokenize fusion (guide §1.2/§2.4, VERDICT r14 #5): the boilerplate
    # segment pass and the DSIR unigram pass both split the SAME corpus —
    # previously two independent scan+split pipelines. One (doc_id, lang, l)
    # token-array frame is now held and feeds BOTH tokenizations (the two
    # downstream explodes stay genuinely different: aligned 8-gram segment
    # ids vs unigrams). Lazy hold: the pd_seg build below is the first job
    # and fills the cache in-flight; at cache-overflow scale the slot spills
    # or recomputes a column-pruned scan, either stays corpus-linear.
    tokl = _sc_cache.hold(
        spread(docs).select(
            "doc_id", "lang", F.split("text", " ").alias("l")
        ),
        materialize=False,
    )
    # stage 1: per-doc boilerplate permille over the shared segment frame
    seg = (
        tokl.where(F.size("l") >= _BP_SEG)
        .select("doc_id", F.explode(F.expr(_bp_segment_ids_expr())).alias("tid"))
    )
    pd_seg = _sc_cache.hold(
        seg.groupBy("doc_id", "tid").agg(F.count("*").alias("cnt"))
    )
    boiler = (
        pd_seg.groupBy("tid")
        .agg(F.count("*").alias("nd"))
        .where(F.col("nd") >= _BP_MIN_DOCS)
        .select("tid")
    )
    tot = pd_seg.groupBy("doc_id").agg(F.sum("cnt").alias("tot"))
    binst = (
        pd_seg.join(F.broadcast(boiler), "tid")
        .groupBy("doc_id")
        .agg(F.sum("cnt").alias("binst"))
    )
    bp = (
        # every doc appears in tokl (split never drops rows), so the
        # cached frame doubles as the doc-id spine — no extra parquet scan
        tokl.select("doc_id")
        .join(tot, "doc_id", "left")
        .join(binst, "doc_id", "left")
        .select(
            "doc_id",
            F.expr(
                "CASE WHEN tot IS NULL THEN CAST(0 AS BIGINT) "
                "ELSE CAST(COALESCE(binst, 0) * 1000 DIV tot AS BIGINT) END"
            ).alias("bp"),
        )
    )
    survivors = bp.where(F.col("bp") <= _SC_MAX_BP).select("doc_id")
    # stage 2: DSIR keep set (weights from the RAW corpus) — scored off
    # the SAME held token frame (r15 fusion, see tokl above)
    keep = _sc_keep_cache.hold(
        survivors.join(_dsir_score_frame(docs, tokens=tokl), "doc_id")
        .orderBy(F.desc("dsir_score"), "doc_id")
        .limit(_SC_TOPN)
    )
    # stage 3: group-aware split of the keep set
    g = keep.join(
        docs.select("doc_id", F.expr(_NORM_SPARK).alias("gkey")), "doc_id"
    ).select(
        "gkey",
        "dsir_score",
        F.expr(
            f"CASE WHEN {bucket_sql_spark('gkey', _SC_SEED)} < 800 THEN 'train' "
            f"WHEN {bucket_sql_spark('gkey', _SC_SEED)} < 900 THEN 'val' "
            "ELSE 'test' END"
        ).alias("split"),
    )
    leaky = (
        g.groupBy("gkey")
        .agg(F.countDistinct("split").alias("ns"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("ns") > 1, 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias("n_leaky_groups")
        )
    )
    return (
        g.groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("gkey").cast("long").alias("n_groups"),
            F.sum("dsir_score").cast("long").alias("sum_dsir"),
        )
        .crossJoin(F.broadcast(leaky))
        .orderBy("split")
    )


def _select_compose_oracle() -> str:
    from ..functions.hashing import (
        HASH_PRIME,
        bucket_sql_duck,
        token_id_sql_duck,
    )
    from .extras import _NORM_DUCK

    bucket = bucket_sql_duck("tok", _DSIR_SEED, _DSIR_B)
    sbucket = bucket_sql_duck("gkey", _SC_SEED)
    return (
        "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l "
        "              FROM documents), "
        f"seg AS (SELECT doc_id, "
        f"        unnest(list_transform(generate_series(0, (len(l) - {_BP_SEG}) "
        f"        // {_BP_SEG}), i -> array_to_string("
        f"        l[i * {_BP_SEG} + 1 : i * {_BP_SEG} + {_BP_SEG}], ' '))) AS s "
        f"        FROM toks WHERE len(l) >= {_BP_SEG}), "
        f"ids AS (SELECT doc_id, {token_id_sql_duck('s')} % {HASH_PRIME} AS tid "
        "        FROM seg), "
        "pds AS (SELECT doc_id, tid, COUNT(*) AS cnt "
        "        FROM ids GROUP BY doc_id, tid), "
        "dfc AS (SELECT tid, COUNT(*) AS nd FROM pds GROUP BY tid), "
        f"boiler AS (SELECT tid FROM dfc WHERE nd >= {_BP_MIN_DOCS}), "
        "tot AS (SELECT doc_id, SUM(cnt) AS tot FROM pds GROUP BY doc_id), "
        "binst AS (SELECT p.doc_id, SUM(p.cnt) AS binst FROM pds p "
        "          JOIN boiler b ON p.tid = b.tid GROUP BY p.doc_id), "
        "bp AS (SELECT d.doc_id, CASE WHEN t.tot IS NULL THEN 0 "
        "       ELSE COALESCE(bi.binst, 0) * 1000 // t.tot END AS bp "
        "       FROM documents d LEFT JOIN tot t ON d.doc_id = t.doc_id "
        "       LEFT JOIN binst bi ON d.doc_id = bi.doc_id), "
        f"surv AS (SELECT doc_id FROM bp WHERE bp <= {_SC_MAX_BP}), "
        "tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok "
        "        FROM documents), "
        f"tb AS (SELECT doc_id, lang, {bucket} AS b FROM tok), "
        "pdk AS (SELECT doc_id, lang, b, COUNT(*) AS cnt "
        "        FROM tb GROUP BY doc_id, lang, b), "
        "cntb AS (SELECT b, SUM(cnt) AS rn, "
        "         SUM(CASE WHEN lang = 'en' THEN cnt ELSE 0 END) AS tn "
        "         FROM pdk GROUP BY b), "
        "w AS (SELECT b, (tn + 1) * 1000000 // (rn + 1) AS w FROM cntb), "
        "ds AS (SELECT doc_id, CAST(SUM(w.w * pdk.cnt) // SUM(pdk.cnt) "
        "       AS BIGINT) AS dsir_score "
        "       FROM pdk JOIN w ON pdk.b = w.b GROUP BY doc_id), "
        "keep AS (SELECT s.doc_id, ds.dsir_score FROM surv s "
        "         JOIN ds ON s.doc_id = ds.doc_id "
        f"        ORDER BY ds.dsir_score DESC, s.doc_id LIMIT {_SC_TOPN}), "
        f"g AS (SELECT {_NORM_DUCK} AS gkey, k.dsir_score, "
        f"      CASE WHEN {sbucket} < 800 THEN 'train' "
        f"           WHEN {sbucket} < 900 THEN 'val' ELSE 'test' END AS split "
        "      FROM keep k JOIN documents d ON k.doc_id = d.doc_id), "
        "leak AS (SELECT COALESCE(SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END), 0) "
        "         AS nl FROM (SELECT gkey, COUNT(DISTINCT split) AS ns "
        "                     FROM g GROUP BY gkey) t) "
        "SELECT split, COUNT(*) AS n_docs, "
        "COUNT(DISTINCT gkey) AS n_groups, "
        "CAST(SUM(dsir_score) AS BIGINT) AS sum_dsir, "
        "(SELECT CAST(nl AS BIGINT) FROM leak) AS n_leaky_groups "
        "FROM g GROUP BY split ORDER BY split"
    )


df_query(
    "pipeline_select_compose",
    _select_compose,
    oracle=_select_compose_oracle(),
    tables=DOCS,
    tags=("pipeline", "sampling", "dsir", "boilerplate", "split"),
    doc=f"selection tier composed: boilerplate gate (per-doc permille <= "
    f"{_SC_MAX_BP}) -> DSIR top-{_SC_TOPN} keep (raw-corpus weights) -> "
    "group-aware train/val/test split with the zero-leakage invariant "
    "certified in-row - the corpus-to-keep-set selection DAG end to end",
)


# Vocabulary coverage curve (the tokenizer-sizing gauge text_zipf_check's
# constancy test doesn't give): how much corpus token mass the top-k
# vocabulary ranks cover, plus the rank where cumulative coverage crosses
# 90% — the number a vocab-size / OOV-budget decision actually reads.
# The ranking window runs over the VOCABULARY (bounded by distinct
# tokens), never the corpus, so the sort stays dictionary-scale at 100 TB.
def _vocab_coverage_sql(unnest: str, idiv: str) -> str:
    return (
        "WITH tf AS (SELECT w, COUNT(*) AS f FROM "
        f"  (SELECT {unnest} AS w FROM documents) x GROUP BY w), "
        "ranked AS (SELECT w, f, ROW_NUMBER() OVER (ORDER BY f DESC, w) "
        "           AS r FROM tf), "
        "tot AS (SELECT SUM(f) AS total, COUNT(*) AS vocab FROM tf), "
        "cum AS (SELECT r, SUM(f) OVER (ORDER BY r) AS cf FROM ranked) "
        "SELECT CAST(t.vocab AS BIGINT) AS vocab_size, "
        "CAST(t.total AS BIGINT) AS total_tokens, "
        "CAST(MIN(CASE WHEN c.cf * 1000 >= 900 * t.total THEN c.r END) "
        "     AS BIGINT) AS p90_rank, "
        f"CAST(MAX(CASE WHEN c.r = 10 THEN c.cf * 1000 {idiv} t.total END) "
        "     AS BIGINT) AS head10_permille "
        "FROM cum c CROSS JOIN tot t GROUP BY t.vocab, t.total"
    )


sql_query(
    "vocab_coverage_curve",
    _vocab_coverage_sql("explode(split(text, ' '))", "DIV"),
    oracle=_vocab_coverage_sql("unnest(string_split(text, ' '))", "//"),
    tables=DOCS,
    tags=("text", "vocab", "quality"),
    doc="vocabulary coverage: total tokens, vocab size, rank covering 90% "
    "of token mass, and top-10-rank coverage permille - the tokenizer "
    "vocab-sizing gauge over a dictionary-bounded window",
)


# ---- Gopher-style repetition filters (Rae et al. 2021) ----------------------

# The classic repetition quality suite for crawl curation: documents
# dominated by repeated n-grams or token runs are SEO spam / template
# residue and get filtered before training. Per doc: coverage of the
# single most frequent 2-gram, coverage of all duplicated 3-grams, and
# the longest consecutive same-token run (islands via pos - row_number,
# the standard gaps-and-islands shape). All coverage is integer floor
# permille capped at 1000 (overlapping n-grams can over-count by
# construction — Gopher's character-fraction metric has the same
# property, so the cap is the documented semantic, identical in both
# engines). The tokenized (doc_id, l, n) frame is held in a CacheSlot
# so the three consumers (2-gram counts, 3-gram counts, position
# islands) read ONE materialized tokenize pass instead of scanning the
# text column three times (the physical-plan audit caught 4 scans in the
# pure-CTE form — Spark inlines WITH); every downstream groupBy key is
# (doc_id, ...), so the shuffles are corpus-linear and skew-free at
# 100 TB, and at cache-overflow scale the slot spills or recomputes a
# column-pruned scan — either stays linear.

_REP_TOP2_MAX = 200  # most-frequent-2-gram coverage cap (permille)
_REP_DUP3_MAX = 300  # duplicated-3-gram coverage cap (permille)
_REP_RUN_MAX = 4  # longest same-token run cap
_rep_cache = CacheSlot()


def _repetition_sql(dialect: str, from_view: bool = False) -> str:
    if dialect == "spark":
        base = (
            "base AS (SELECT doc_id, l, n FROM rep_base), "
            if from_view
            else (
                "toks AS (SELECT doc_id, split(text, ' ') AS l FROM documents), "
                "base AS (SELECT doc_id, l, size(l) AS n FROM toks "
                "         WHERE size(l) >= 3), "
            )
        )
        toks = base + (
            "g2 AS (SELECT doc_id, n, explode(transform(sequence(1, size(l) - 1), "
            "       i -> concat(element_at(l, i), ' ', element_at(l, i + 1)))) AS g "
            "       FROM base), "
            "g3 AS (SELECT doc_id, n, explode(transform(sequence(1, size(l) - 2), "
            "       i -> concat(element_at(l, i), ' ', element_at(l, i + 1), ' ', "
            "                   element_at(l, i + 2)))) AS g "
            "       FROM base), "
            "tok AS (SELECT doc_id, pos, t FROM base "
            "        LATERAL VIEW posexplode(l) x AS pos, t), "
        )
        idiv = "DIV"
    else:
        toks = (
            "toks AS (SELECT doc_id, string_split(text, ' ') AS l "
            "         FROM documents), "
            "base AS (SELECT doc_id, l, len(l) AS n FROM toks "
            "         WHERE len(l) >= 3), "
            "g2 AS (SELECT doc_id, n, l[i] || ' ' || l[i + 1] AS g "
            "       FROM base, unnest(generate_series(1, len(l) - 1)) AS x(i)), "
            "g3 AS (SELECT doc_id, n, "
            "       l[i] || ' ' || l[i + 1] || ' ' || l[i + 2] AS g "
            "       FROM base, unnest(generate_series(1, len(l) - 2)) AS x(i)), "
            "tok AS (SELECT doc_id, i AS pos, l[i] AS t "
            "        FROM base, unnest(generate_series(1, len(l))) AS x(i)), "
        )
        idiv = "//"
    return (
        f"WITH {toks}"
        "c2 AS (SELECT doc_id, n, g, COUNT(*) AS c FROM g2 "
        "       GROUP BY doc_id, n, g), "
        f"t2 AS (SELECT doc_id, CAST(LEAST(1000, MAX(c) * 2000 {idiv} n) "
        "        AS BIGINT) AS top2gram_permille "
        "        FROM c2 GROUP BY doc_id, n), "
        "c3 AS (SELECT doc_id, n, g, COUNT(*) AS c FROM g3 "
        "       GROUP BY doc_id, n, g), "
        "d3 AS (SELECT doc_id, CAST(LEAST(1000, COALESCE(SUM(CASE WHEN c >= 2 "
        f"        THEN c * 3 END), 0) * 1000 {idiv} n) AS BIGINT) "
        "        AS dup3gram_permille "
        "        FROM c3 GROUP BY doc_id, n), "
        "isl AS (SELECT doc_id, t, pos - ROW_NUMBER() OVER ("
        "        PARTITION BY doc_id, t ORDER BY pos) AS grp FROM tok), "
        "runs AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS max_token_run "
        "         FROM (SELECT doc_id, t, grp, COUNT(*) AS c FROM isl "
        "               GROUP BY doc_id, t, grp) r GROUP BY doc_id) "
        "SELECT b.doc_id, CAST(b.n AS BIGINT) AS n_tokens, "
        "t2.top2gram_permille, d3.dup3gram_permille, runs.max_token_run, "
        f"CAST(CASE WHEN t2.top2gram_permille <= {_REP_TOP2_MAX} "
        f"     AND d3.dup3gram_permille <= {_REP_DUP3_MAX} "
        f"     AND runs.max_token_run <= {_REP_RUN_MAX} "
        "     THEN 1 ELSE 0 END AS INT) AS repetition_ok "
        "FROM (SELECT doc_id, n FROM base) b "
        "JOIN t2 ON b.doc_id = t2.doc_id "
        "JOIN d3 ON b.doc_id = d3.doc_id "
        "JOIN runs ON b.doc_id = runs.doc_id "
        "ORDER BY b.doc_id"
    )


def _repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    _rep_cache.release()
    docs = register_views(spark, sf_dir, DOCS)["documents"]
    base = _rep_cache.hold(
        docs.selectExpr("doc_id", "split(text, ' ') AS l")
        .where(F.size("l") >= 3)
        .selectExpr("doc_id", "l", "size(l) AS n")
    )
    base.createOrReplaceTempView("rep_base")
    return spark.sql(_repetition_sql("spark", from_view=True))


df_query(
    "text_repetition_filters",
    _repetition,
    oracle=_repetition_sql("duck"),
    tables=DOCS,
    tags=("text", "quality", "repetition"),
    doc="Gopher-style repetition filters (Rae et al. 2021): top-2-gram "
    "coverage, duplicated-3-gram coverage (floor permille, capped) and "
    "longest same-token run per doc, with the composite keep flag — the "
    "crawl-spam gate that precedes dedup in a curation pipeline",
)


# ---- PII detection + redaction ----------------------------------------------

# Standard pre-training privacy pass: find and mask email-shaped and
# ipv4-shaped spans. The fixture text is word salad with no PII, so the
# query PLANTS two deterministic spans per row from the doc's own tokens
# (first-token@second-token.com and a doc_id-derived IPv4) and then
# redacts — the regex engines (Java vs RE2) are exercised on every row
# and certified by the redacted text hash, not just on a lucky fixture.
# Patterns stick to character classes + quantifiers (no lookaround, no
# shorthand-class divergence), the portable regex subset. regexp_replace
# replaces ALL matches in Spark by default; DuckDB needs the explicit
# 'g' flag — that dialect split is the certified behaviour here.

_PII_EMAIL = "[a-z0-9]+@[a-z0-9]+[.]com"
_PII_IPV4 = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"


def _pii_sql(dialect: str) -> str:
    if dialect == "spark":
        planted = (
            "concat(element_at(split(text, ' '), 1), '@', "
            "element_at(split(text, ' '), 2), '.com contact ', "
            "CAST(pmod(doc_id, 256) AS STRING), '.0.', "
            "CAST(pmod(doc_id * 7, 256) AS STRING), '.1 ', text)"
        )

        def redact(expr: str, pat: str, repl: str) -> str:
            return f"regexp_replace({expr}, '{pat}', '{repl}')"

        def n_matches(expr: str, pat: str) -> str:
            return f"size(regexp_extract_all({expr}, '{pat}', 0))"

    else:
        planted = (
            "concat(string_split(text, ' ')[1], '@', "
            "string_split(text, ' ')[2], '.com contact ', "
            "CAST(doc_id % 256 AS VARCHAR), '.0.', "
            "CAST((doc_id * 7) % 256 AS VARCHAR), '.1 ', text)"
        )

        def redact(expr: str, pat: str, repl: str) -> str:
            return f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"

        def n_matches(expr: str, pat: str) -> str:
            return f"len(regexp_extract_all({expr}, '{pat}'))"

    both = redact(redact("raw", _PII_EMAIL, "<EMAIL>"), _PII_IPV4, "<IP>")
    # <2-token docs would diverge: Spark's element_at yields NULL making
    # concat() NULL while DuckDB's concat ignores NULLs — filter them in
    # BOTH dialects (the repetition-filter n>=3 pattern)
    n_tok = (
        "size(split(text, ' '))"
        if dialect == "spark"
        else "len(string_split(text, ' '))"
    )
    return (
        f"WITH p AS (SELECT doc_id, {planted} AS raw FROM documents "
        f"WHERE {n_tok} >= 2) "
        "SELECT doc_id, "
        f"CAST({n_matches('raw', _PII_EMAIL)} AS BIGINT) AS n_emails, "
        f"CAST({n_matches('raw', _PII_IPV4)} AS BIGINT) AS n_ips, "
        f"md5({both}) AS redacted_md5 "
        "FROM p ORDER BY doc_id"
    )


sql_query(
    "text_pii_redact",
    _pii_sql("spark"),
    oracle=_pii_sql("duck"),
    tables=DOCS,
    tags=("text", "pii", "quality"),
    doc="PII detection + redaction: email/ipv4 span counts and the "
    "md5 of the fully redacted text (spans planted deterministically "
    "per row so the regex path is exercised on every document) — the "
    "pre-training privacy pass, portable-regex subset",
)


# ---- per-source frequency caps (RefinedWeb-style) ----------------------------

# Crawl corpora are dominated by a few mega-sources; capping docs kept
# per source bounds any single origin's influence on the training mix.
# Keep set = the _SRC_CAP lowest seeded-hash-ranked docs per source —
# deterministic, reproducible, and one window over a corpus-linear
# shuffle keyed by source (the per-source rank never materializes more
# than the group). Output is the per-source audit: kept/dropped counts
# certify the cap; the keep list itself is the rank <= cap predicate.

_SRC_CAP = 200


def _source_caps_sql(dialect: str) -> str:
    if dialect == "spark":
        h = (
            "CAST(conv(substr(md5(concat('srccap1:', "
            "CAST(doc_id AS STRING))),1,15),16,10) AS BIGINT)"
        )
        idiv = "DIV"
    else:
        h = (
            "('0x' || substr(md5('srccap1:' || "
            "CAST(doc_id AS VARCHAR)),1,15))::BIGINT"
        )
        idiv = "//"
    return (
        "WITH ranked AS (SELECT source, doc_id, "
        f"  ROW_NUMBER() OVER (PARTITION BY source ORDER BY {h}, doc_id) "
        "  AS rnk FROM documents) "
        "SELECT source, COUNT(*) AS n_docs, "
        f"CAST(SUM(CASE WHEN rnk <= {_SRC_CAP} THEN 1 ELSE 0 END) AS BIGINT) "
        "  AS n_kept, "
        f"CAST(SUM(CASE WHEN rnk > {_SRC_CAP} THEN 1 ELSE 0 END) AS BIGINT) "
        "  AS n_dropped, "
        f"CAST(LEAST(COUNT(*), {_SRC_CAP}) * 1000 {idiv} COUNT(*) AS BIGINT) "
        "  AS keep_permille "
        "FROM ranked GROUP BY source ORDER BY source"
    )


sql_query(
    "sample_source_caps",
    _source_caps_sql("spark"),
    oracle=_source_caps_sql("duck"),
    tables=DOCS,
    tags=("sampling", "curation", "quality"),
    doc=f"per-source frequency cap (RefinedWeb-style): keep the "
    f"{_SRC_CAP} lowest seeded-hash-ranked docs per source; per-source "
    "kept/dropped audit certifies the cap — bounds any single origin's "
    "share of the training mix",
)


# ---- character-class stats + collision entropy proxy -------------------------

# Char-level quality signals: class ratios (alpha/digit/space permille)
# and a diversity score. Shannon entropy needs ln() — libm results are
# not bit-identical across engines, so it cannot be hash-certified;
# Renyi-2 COLLISION probability (sum p_i^2, the chance two random char
# draws collide) carries the same low-diversity signal as pure integer
# arithmetic: collision_ppm = sum(k^2) * 1e6 DIV n^2. ONE char explode
# feeds every metric (class counts come from the same per-char frequency
# frame via range predicates); all groupBy keys are doc-local, so the
# shuffle is corpus-linear. Bound: k <= n <= ~1e4 chars/doc keeps
# sum(k^2)*1e6 <= 1e14 — no overflow anywhere near real doc sizes.


def _char_stats_sql(dialect: str) -> str:
    if dialect == "spark":
        ch = (
            "ch AS (SELECT doc_id, length(text) AS n, "
            "       explode(transform(sequence(1, length(text)), "
            "       i -> substring(text, i, 1))) AS c "
            "       FROM documents WHERE length(text) > 0), "
        )
        idiv = "DIV"
    else:
        ch = (
            "ch AS (SELECT doc_id, length(text) AS n, substr(text, i, 1) AS c "
            "       FROM documents, "
            "       unnest(generate_series(1, length(text))) AS x(i) "
            "       WHERE length(text) > 0), "
        )
        idiv = "//"
    return (
        f"WITH {ch}"
        "cc AS (SELECT doc_id, n, c, COUNT(*) AS k FROM ch "
        "       GROUP BY doc_id, n, c) "
        "SELECT doc_id, CAST(n AS BIGINT) AS n_chars, "
        f"CAST(COALESCE(SUM(CASE WHEN c >= 'a' AND c <= 'z' THEN k END), 0) "
        f"     * 1000 {idiv} n AS BIGINT) AS alpha_permille, "
        f"CAST(COALESCE(SUM(CASE WHEN c >= '0' AND c <= '9' THEN k END), 0) "
        f"     * 1000 {idiv} n AS BIGINT) AS digit_permille, "
        f"CAST(COALESCE(SUM(CASE WHEN c = ' ' THEN k END), 0) "
        f"     * 1000 {idiv} n AS BIGINT) AS space_permille, "
        f"CAST(SUM(k * k) * 1000000 {idiv} (n * n) AS BIGINT) AS collision_ppm "
        "FROM cc GROUP BY doc_id, n ORDER BY doc_id"
    )


sql_query(
    "text_char_stats",
    _char_stats_sql("spark"),
    oracle=_char_stats_sql("duck"),
    tables=DOCS,
    tags=("text", "quality", "entropy"),
    doc="char-class ratios (alpha/digit/space permille) + Renyi-2 "
    "collision probability in ppm — the integer-exact entropy proxy for "
    "low-diversity/garbage detection (libm-free, hash-certifiable), one "
    "char explode with doc-local aggregation",
)
