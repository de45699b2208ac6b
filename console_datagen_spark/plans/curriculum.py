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
