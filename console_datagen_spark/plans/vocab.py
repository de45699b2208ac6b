"""Tokenizer vocab induction — BPE merge training with a round-exact oracle.

The DuckDB oracle replays the full recurrence as chained CTEs: per round,
an adjacent-pair count, a deterministic argmax (count desc, pair lexic),
and the same space-delimited left-fold merge the Spark expression runs
(`list_reduce` seeds with the first element exactly like Spark's
``aggregate(slice(...), syms[0], ...)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views
from ..operators.bpe import bpe_compression_by_lang, bpe_merges_plan
from ..functions.hashing import bucket_sql_duck, bucket_sql_spark
from .registry import df_query, sql_query

_ROUNDS = 3

DOCS = ("documents",)


def _duck_bpe_sql(rounds: int = _ROUNDS) -> str:
    parts = [
        "wf AS (SELECT word, COUNT(*) AS freq FROM "
        "  (SELECT unnest(string_split(text, ' ')) AS word FROM documents) "
        "  WHERE word <> '' GROUP BY word), ",
        "s0 AS (SELECT word, freq, list_transform("
        "generate_series(1, length(word)), i -> word[i:i]) AS syms FROM wf)",
    ]
    for k in range(1, rounds + 1):
        prev = f"s{k - 1}"
        parts.append(
            f", p{k} AS (SELECT syms[i] AS l, syms[i + 1] AS r, "
            f"  CAST(SUM(freq) AS BIGINT) AS cnt "
            f"  FROM (SELECT freq, syms, unnest(generate_series(1, len(syms) - 1)) AS i "
            f"        FROM {prev} WHERE len(syms) >= 2) "
            f"  GROUP BY 1, 2)"
            f", b{k} AS (SELECT l, r, cnt FROM p{k} ORDER BY cnt DESC, l, r LIMIT 1)"
            f", s{k} AS (SELECT word, freq, string_split(list_reduce(syms, "
            f"  (acc, x) -> CASE WHEN x = b{k}.r AND (acc = b{k}.l "
            f"    OR acc[-(length(b{k}.l) + 1):] = ' ' || b{k}.l) "
            f"  THEN acc[1:length(acc) - length(b{k}.l)] || b{k}.l || b{k}.r "
            f"  ELSE acc || ' ' || x END), ' ') AS syms FROM {prev}, b{k})"
        )
    unions = " UNION ALL ".join(
        f"SELECT {k} AS round, l AS \"left\", r AS \"right\", cnt AS pair_count "
        f"FROM b{k}"
        for k in range(1, rounds + 1)
    )
    return (
        "WITH " + "".join(parts) + " SELECT CAST(round AS INT) AS round, "
        "\"left\", \"right\", pair_count FROM (" + unions + ") ORDER BY round"
    )


def _bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = register_views(spark, sf_dir, DOCS)["documents"]
    return bpe_merges_plan(docs, rounds=_ROUNDS).orderBy("round")


df_query(
    "vocab_bpe_merges",
    _bpe,
    oracle=_duck_bpe_sql(),
    tables=DOCS,
    tags=("text", "vocab", "bpe", "iterative"),
    doc="BPE tokenizer training (Sennrich 2016): 3 merge rounds over the "
    "freq-weighted distinct-word table — adjacent-pair count, argmax, "
    "leftmost-nonoverlapping merge fold; fully declarative single plan, "
    "round-exact vs the DuckDB CTE replay",
)


def _bpe_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = register_views(spark, sf_dir, DOCS)["documents"]
    return bpe_compression_by_lang(docs, rounds=_ROUNDS)


def _duck_bpe_compression_sql(rounds: int = _ROUNDS) -> str:
    # reuse the training CTE chain, then join the corpus occurrences to
    # the final state's per-word symbol counts
    base = _duck_bpe_sql(rounds)
    ctes = base[len("WITH ") : base.index(" SELECT CAST(round")]
    return (
        "WITH " + ctes + ", "
        "occ AS (SELECT lang, unnest(string_split(text, ' ')) AS word "
        "        FROM documents), "
        f"vocab AS (SELECT word, len(syms) AS n_syms FROM s{rounds}) "
        "SELECT lang, CAST(SUM(length(o.word)) AS BIGINT) AS total_chars, "
        "CAST(SUM(n_syms) AS BIGINT) AS total_syms, "
        "CAST(SUM(n_syms) * 1000 // SUM(length(o.word)) AS BIGINT) "
        "  AS compression_permille "
        "FROM occ o JOIN vocab v ON o.word = v.word WHERE o.word <> '' "
        "GROUP BY lang ORDER BY lang"
    )


df_query(
    "vocab_bpe_compression",
    _bpe_compression,
    oracle=_duck_bpe_compression_sql(),
    tables=DOCS,
    tags=("text", "vocab", "bpe", "telemetry"),
    doc="trained BPE merges applied: per-lang corpus compression gauge "
    "(chars vs post-merge symbols, permille) — corpus tokens equi-join "
    "the vocab-bound final state; detects merges overfit to one language",
)


# ---- OOV-rate gauge --------------------------------------------------------
# Tokenizer/vocab coverage discipline: induce the top-K word vocabulary
# from the TRAIN hash-split only, then measure what fraction of VAL
# tokens fall outside it (out-of-vocabulary permille, total and
# per-lang). The vocab is a top-K over a hash agg (broadcastable at any
# corpus size for realistic K); the val probe is one anti-joinable
# lookup — and fitting on train only is the same leakage discipline as
# feat_target_encode.

_VOCAB_K = 500

_B_SPARK = bucket_sql_spark("doc_id")
_B_DUCK = bucket_sql_duck("doc_id")


def _oov_sql(dialect: str) -> str:
    if dialect == "spark":
        bucket, idiv = _B_SPARK, "DIV"
        tok = (
            "SELECT doc_id, lang, explode(split(text, ' ')) AS w "
            "FROM documents"
        )
    else:
        bucket, idiv = _B_DUCK, "//"
        tok = (
            "SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w "
            "FROM documents"
        )
    return (
        f"WITH tokens AS ({tok}), "
        f"tagged AS (SELECT lang, w, "
        f"  CASE WHEN {bucket} < 800 THEN 'train' ELSE 'val' END AS split "
        "  FROM tokens), "
        "vocab AS (SELECT w FROM ("
        "  SELECT w, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, w) AS rnk "
        "  FROM tagged WHERE split = 'train' GROUP BY w) t "
        f"  WHERE rnk <= {_VOCAB_K}), "
        "val AS (SELECT t.lang, t.w, "
        "  CASE WHEN v.w IS NULL THEN 1 ELSE 0 END AS oov "
        "  FROM tagged t LEFT JOIN vocab v ON t.w = v.w "
        "  WHERE t.split = 'val') "
        "SELECT lang, CAST(COUNT(*) AS BIGINT) AS val_tokens, "
        "CAST(SUM(oov) AS BIGINT) AS oov_tokens, "
        f"CAST(SUM(oov) * 1000 {idiv} COUNT(*) AS BIGINT) AS oov_permille "
        "FROM val GROUP BY lang ORDER BY lang"
    )


sql_query(
    "vocab_oov_rate",
    _oov_sql("spark"),
    oracle=_oov_sql("duck"),
    tables=DOCS,
    tags=("vocab", "coverage", "sampling"),
    doc=f"out-of-vocabulary gauge: top-{_VOCAB_K} word vocab fit on the "
    "train hash-split, OOV permille of val tokens per lang — tokenizer "
    "coverage with the train-only fitting discipline",
)
