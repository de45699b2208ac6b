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
from .registry import df_query

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
