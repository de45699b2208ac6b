"""Bloom-filter membership prefilter for decontamination at scale.

``text_decontaminate`` (plans/text_analysis.py) joins every corpus 8-gram
against the holdout hash set — one equi-join keyed on the hash. At 100 TB
even that semi-join shuffles the full corpus n-gram stream. The standard
scale fix is a two-stage probe:

1. build a Bloom bitmap over the holdout n-grams (k=3 probe positions in
   an M-bit array, packed into M/32 words (32 bits per word so neither engine shifts into the BIGINT sign bit) — a few KB, broadcast to
   every executor as a tiny dimension);
2. stream corpus n-grams through the bitmap (broadcast join on the word
   index — no corpus-side shuffle); only bloom-positive docs proceed to
   the exact verification join.

By construction the bloom has NO false negatives, so stage 2's exact join
runs over the bloom-flagged subset only — the query certifies this by
reporting ``n_bloom >= n_exact`` per doc with both counts hash-checked.
False positives (``n_bloom > n_exact``) are the price of the M-bit budget
and are eliminated by stage 2.

Everything is deterministic integer arithmetic (60-bit md5 ids reduced
mod P, fixed probe coefficients), so DuckDB replays the bitmap
bit-for-bit — the certification is exact, not statistical.
"""

from __future__ import annotations

from ..functions.hashing import HASH_PRIME, token_id_sql_duck, token_id_sql_spark
from .registry import sql_query

DOCS = ("documents",)

_M = 262_144  # bloom bits (8192 32-bit words, 32 KiB broadcast)
_COEFFS = ((3, 7), (5, 38), (7, 131))  # k=3 probe hashes: (a*h + b) mod M


def _positions(src: str, cols: str) -> str:
    """UNION ALL of the k probe positions over ``src``."""
    return " UNION ALL ".join(
        f"SELECT {cols}, ({a} * h + {b}) % {_M} AS p FROM {src}"
        for a, b in _COEFFS
    )


def _bloom_sql(
    tok_id: str, div: str, shift, unpack: str, split_expr: str, size_expr: str
) -> str:
    """The full two-stage pipeline in one dialect.

    ``div`` is the integer-division spelling; ``shift(col)`` renders the
    1 << (col % 32) probe bit for a FULL column expression (taking the
    expression, not patching generated SQL, keeps the probe correct for
    any qualifier — the bare/qualified variants below differ only in the
    argument); ``unpack`` is the 8-gram explode clause; ``split_expr`` /
    ``size_expr`` the tokenizer spellings.
    """
    return (
        f"WITH toks AS (SELECT doc_id, {split_expr} AS l FROM documents "
        f"              WHERE {size_expr} >= 8), "
        f"sh AS ({unpack}), "
        f"ids AS (SELECT DISTINCT doc_id, {tok_id} % {HASH_PRIME} AS h FROM sh), "
        "hold AS (SELECT DISTINCT h FROM ids WHERE doc_id % 10 = 0), "
        f"hpos AS ({_positions('hold', 'h')}), "
        f"words AS (SELECT CAST(p {div} 32 AS INT) AS word, "
        f"          bit_or({shift('CAST(p % 32 AS INT)')}) AS mask "
        f"          FROM hpos GROUP BY CAST(p {div} 32 AS INT)), "
        "corpus AS (SELECT doc_id, h FROM ids WHERE doc_id % 10 <> 0), "
        f"cpos AS ({_positions('corpus', 'doc_id, h')}), "
        "probe AS (SELECT c.doc_id, c.h, "
        f"          CASE WHEN (COALESCE(w.mask, 0) & {shift('CAST(c.p % 32 AS INT)')}) <> 0 "
        "               THEN 1 ELSE 0 END AS ok "
        f"          FROM cpos c LEFT JOIN words w ON CAST(c.p {div} 32 AS INT) = w.word), "
        "bloomhits AS (SELECT doc_id, h FROM probe GROUP BY doc_id, h "
        f"              HAVING SUM(ok) = {len(_COEFFS)}), "
        "nb AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bloom "
        "       FROM bloomhits GROUP BY doc_id), "
        "ne AS (SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_exact "
        "       FROM corpus c JOIN hold ON c.h = hold.h GROUP BY c.doc_id) "
        "SELECT nb.doc_id, n_bloom, COALESCE(n_exact, 0) AS n_exact, "
        "       CAST(n_bloom >= COALESCE(n_exact, 0) AS INT) AS no_false_neg "
        "FROM nb LEFT JOIN ne ON nb.doc_id = ne.doc_id ORDER BY nb.doc_id"
    )


_DUCK_UNPACK = (
    "SELECT doc_id, unnest(list_transform(generate_series(1, len(l) - 7), "
    "i -> array_to_string(l[i:i+7], ' '))) AS s FROM toks"
)

_BLOOM_DUCK = _bloom_sql(
    tok_id=token_id_sql_duck("s"),
    div="//",
    shift=lambda col: f"(CAST(1 AS BIGINT) << {col})",
    unpack=_DUCK_UNPACK,
    split_expr="string_split(text, ' ')",
    size_expr="len(string_split(text, ' '))",
)


_SPARK_POS = "explode(array(" + ", ".join(
    f"({a} * h + {b}) % {_M}" for a, b in _COEFFS) + "))"

# Spark side: positions come from ONE generator expression
# (explode(array(...))) instead of the oracle's UNION ALL — Spark inlines
# CTE references, so a 3-way UNION ALL would re-run the whole n-gram
# pipeline per branch; the generator fans out in-place. DuckDB
# materializes CTEs, so its UNION ALL form costs one evaluation anyway.
# No persist: the exploded n-gram frame is corpus-sized times 8 — at
# 100 TB recomputing the scan (2 evaluations: probe + exact verify)
# beats caching it.
_BLOOM_SPARK = (
    "WITH toks AS (SELECT doc_id, split(text, ' ') AS l FROM documents "
    "              WHERE size(split(text, ' ')) >= 8), "
    "sh AS (SELECT doc_id, explode(transform(sequence(1, size(l) - 7), "
    "       i -> concat_ws(' ', slice(l, i, 8)))) AS s FROM toks), "
    f"ids AS (SELECT DISTINCT doc_id, {token_id_sql_spark('s')} % {HASH_PRIME} AS h FROM sh), "
    "hold AS (SELECT DISTINCT h FROM ids WHERE doc_id % 10 = 0), "
    f"hpos AS (SELECT {_SPARK_POS} AS p FROM hold), "
    "words AS (SELECT CAST(p DIV 32 AS INT) AS word, "
    "          bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))) AS mask "
    "          FROM hpos GROUP BY CAST(p DIV 32 AS INT)), "
    "corpus AS (SELECT doc_id, h FROM ids WHERE doc_id % 10 <> 0), "
    f"cpos AS (SELECT doc_id, h, {_SPARK_POS} AS p FROM corpus), "
    "probe AS (SELECT c.doc_id, c.h, "
    "          CASE WHEN (COALESCE(w.mask, 0) & "
    "               shiftleft(CAST(1 AS BIGINT), CAST(c.p % 32 AS INT))) <> 0 "
    "               THEN 1 ELSE 0 END AS ok "
    "          FROM cpos c LEFT JOIN words w ON CAST(c.p DIV 32 AS INT) = w.word), "
    "bloomhits AS (SELECT doc_id, h FROM probe GROUP BY doc_id, h "
    f"              HAVING SUM(ok) = {len(_COEFFS)}), "
    "nb AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bloom "
    "       FROM bloomhits GROUP BY doc_id), "
    "ne AS (SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_exact "
    "       FROM corpus c JOIN hold ON c.h = hold.h GROUP BY c.doc_id) "
    "SELECT nb.doc_id, n_bloom, COALESCE(n_exact, 0) AS n_exact, "
    "       CAST(n_bloom >= COALESCE(n_exact, 0) AS INT) AS no_false_neg "
    "FROM nb LEFT JOIN ne ON nb.doc_id = ne.doc_id ORDER BY nb.doc_id"
)


sql_query(
    "dedup_bloom_prefilter",
    _BLOOM_SPARK,
    oracle=_BLOOM_DUCK,
    tables=DOCS,
    tags=("dedup", "bloom", "decontamination"),
    doc=f"two-stage decontamination: {_M}-bit k={len(_COEFFS)} Bloom "
    "prefilter (broadcast word bitmap, no corpus shuffle) + exact verify; "
    "certifies zero false negatives with both counts hash-checked",
)
