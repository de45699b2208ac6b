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
