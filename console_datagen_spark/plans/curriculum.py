"""Curriculum assignment — quality-ordered training phases.

Curriculum training feeds cleaner data first. The engine-side piece is a
deterministic phase assignment: per language, rank docs by a quality
score and cut into N phases with ntile. Integer permille scoring and a
total (score, doc_id) ordering make the assignment replayable anywhere —
at 100 TB this is one window shuffle on (lang), and the phase column
then drives the trainer-feed ordering (compose with pipeline_end_to_end).
"""

from __future__ import annotations

from .registry import sql_query

_PHASES = 3


def _curriculum_sql(size_fn: str, distinct_fn: str, split_fn: str, idiv: str) -> str:
    q = (
        f"{size_fn}({distinct_fn}({split_fn}(text, ' '))) * 1000 "
        f"{idiv} {size_fn}({split_fn}(text, ' '))"
    )
    return (
        f"WITH scored AS (SELECT lang, doc_id, CAST({q} AS BIGINT) AS q "
        "               FROM documents), "
        f"phased AS (SELECT lang, q, NTILE({_PHASES}) OVER "
        "           (PARTITION BY lang ORDER BY q DESC, doc_id) AS phase "
        "           FROM scored) "
        "SELECT lang, CAST(phase AS INT) AS phase, COUNT(*) AS n_docs, "
        "MIN(q) AS min_q, MAX(q) AS max_q "
        "FROM phased GROUP BY lang, phase ORDER BY lang, phase"
    )


sql_query(
    "pipeline_curriculum",
    _curriculum_sql("size", "array_distinct", "split", "DIV"),
    oracle=_curriculum_sql("len", "list_distinct", "string_split", "//"),
    tables=("documents",),
    tags=("pipeline", "curriculum", "window"),
    doc="curriculum phases: per-lang ntile(3) over the distinct-token "
    "quality permille (desc, doc_id tiebreak) — phase 1 = cleanest docs "
    "first; per-phase count + quality envelope",
)


# ---- mixture-weights solver ------------------------------------------------

# target language shares (permille of the training token budget) and the
# budget itself (half the corpus tokens) — the solver turns a recipe into
# per-source sampling rates and upsampling factors, all integer-exact
_SHARES = {"de": 200, "en": 400, "es": 200, "fr": 100, "zh": 100}


def _mix_solver_sql(size_expr: str, idiv: str) -> str:
    shares = " UNION ALL ".join(
        f"SELECT '{lang}' AS lang, {s} AS share_permille"
        for lang, s in sorted(_SHARES.items())
    )
    return (
        f"WITH tok AS (SELECT lang, CAST(SUM({size_expr}) AS BIGINT) AS tokens "
        "             FROM documents GROUP BY lang), "
        f"tot AS (SELECT CAST(SUM(tokens) {idiv} 2 AS BIGINT) AS budget FROM tok), "
        f"sh AS ({shares}) "
        "SELECT t.lang, t.tokens, "
        f"CAST(tot.budget * s.share_permille {idiv} 1000 AS BIGINT) AS want_tokens, "
        # sampling rate capped at a full pass; beyond that you upsample
        f"CAST(LEAST(CAST(1000 AS BIGINT), "
        f"  (tot.budget * s.share_permille {idiv} 1000) * 1000 {idiv} t.tokens) "
        "  AS BIGINT) AS rate_permille, "
        # passes over the source x100 (>100 means repeat the source)
        f"CAST((tot.budget * s.share_permille {idiv} 1000) * 100 {idiv} t.tokens "
        "  AS BIGINT) AS epochs_x100 "
        "FROM tok t JOIN sh s ON t.lang = s.lang CROSS JOIN tot "
        "ORDER BY t.lang"
    )


sql_query(
    "pipeline_mix_solver",
    _mix_solver_sql("size(split(text, ' '))", "DIV"),
    oracle=_mix_solver_sql("len(string_split(text, ' '))", "//"),
    tables=("documents",),
    tags=("pipeline", "mix", "training"),
    doc="mixture-weights solver: target per-lang token shares + budget -> "
    "per-lang sampling rate (permille, capped at full pass) and "
    "upsampling factor (epochs x100) — the recipe arithmetic a training "
    "mix needs, integer-exact",
)
