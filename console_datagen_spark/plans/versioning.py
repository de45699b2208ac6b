"""Corpus snapshot versioning queries — the data-lake diff/audit shapes.

A 100 TB training corpus is rebuilt in snapshots; the operational questions
are "what changed since the last snapshot" (diff) and "which docs does each
snapshot share" (overlap audit). Both are restated so content comparison
happens on 128-bit hashes, never text: the full-outer join shuffles
(doc_id, md5) pairs — fixed-width rows — and Catalyst prunes the text
column out of the scan entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import register_views
from .registry import df_query, sql_query

DOCS = ("documents",)

# deterministic snapshot simulation over the fixture corpus:
# - the OLD snapshot is missing every 11th doc (they are "added" later)
#   and carries a reversed text for every 17th doc (those are "changed")
# - the NEW snapshot is missing every 13th doc ("removed" since old)
_OLD_PRED = "doc_id % 11 != 0"
_NEW_PRED = "doc_id % 13 != 0"
_CHG_PRED = "doc_id % 17 = 0"


def _snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = register_views(spark, sf_dir, DOCS)["documents"]
    old = docs.where(_OLD_PRED).select(
        "doc_id",
        F.md5(
            F.when(F.expr(_CHG_PRED), F.reverse(F.col("text"))).otherwise(
                F.col("text")
            )
        ).alias("h_old"),
    )
    new = docs.where(_NEW_PRED).select("doc_id", F.md5("text").alias("h_new"))
    joined = old.join(new, "doc_id", "full_outer")
    status = (
        F.when(F.col("h_old").isNull(), F.lit("added"))
        .when(F.col("h_new").isNull(), F.lit("removed"))
        .when(F.col("h_old") != F.col("h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("status")
    )


df_query(
    "corpus_snapshot_diff",
    _snapshot_diff,
    oracle=(
        "WITH old AS (SELECT doc_id, md5(CASE WHEN doc_id % 17 = 0 "
        "             THEN reverse(text) ELSE text END) AS h_old "
        f"            FROM documents WHERE {_OLD_PRED}), "
        "new AS (SELECT doc_id, md5(text) AS h_new "
        f"       FROM documents WHERE {_NEW_PRED}), "
        "j AS (SELECT CASE WHEN o.h_old IS NULL THEN 'added' "
        "             WHEN n.h_new IS NULL THEN 'removed' "
        "             WHEN o.h_old <> n.h_new THEN 'changed' "
        "             ELSE 'unchanged' END AS status "
        "      FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id) "
        "SELECT status, COUNT(*) AS n FROM j GROUP BY status ORDER BY status"
    ),
    tables=DOCS,
    tags=("versioning", "cdc", "pipeline"),
    doc="snapshot diff: added/removed/changed/unchanged counts between two "
    "corpus snapshots — full-outer join on doc_id comparing md5 content "
    "hashes only (text never crosses the shuffle; column pruned at scan)",
)


# ---- deletion-impact audit (right-to-erasure) ------------------------------


def _delete_impact_sql(size_expr: str, idiv: str) -> str:
    """Right-to-erasure impact: given a deletion list, how much of each
    derived artifact must be rewritten — docs, context chunks (the
    text_chunking law), packed trainer bins (the pipeline_pack_sequences
    assignment). The bins number is the actionable one: every affected
    bin's parquet partition gets rewritten, the rest of the corpus is
    untouched (the point of deterministic, doc-addressable packing).
    """
    return (
        f"WITH tk AS (SELECT source, doc_id, {size_expr} AS n FROM documents), "
        "del AS (SELECT doc_id FROM documents WHERE doc_id % 97 = 0), "
        "ch AS (SELECT doc_id, CASE WHEN n <= 64 THEN 1 "
        "       ELSE CAST(CEIL((n - 64) / 48.0) AS INT) + 1 END AS n_chunks "
        "       FROM tk), "
        "w AS (SELECT source, doc_id, "
        "      COALESCE(SUM(n) OVER (PARTITION BY source ORDER BY doc_id "
        "        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix "
        "      FROM tk), "
        f"bins AS (SELECT source, doc_id, "
        f"         CAST(FLOOR(prefix / 2048.0) AS BIGINT) AS bin FROM w) "
        "SELECT "
        "CAST((SELECT COUNT(*) FROM del) AS BIGINT) AS n_docs_deleted, "
        "CAST((SELECT COALESCE(SUM(n_chunks), 0) FROM ch "
        "      WHERE doc_id IN (SELECT doc_id FROM del)) AS BIGINT) "
        "  AS n_chunks_deleted, "
        "CAST((SELECT COUNT(*) FROM (SELECT DISTINCT source, bin FROM bins "
        "      WHERE doc_id IN (SELECT doc_id FROM del)) a) AS BIGINT) "
        "  AS n_bins_affected, "
        "CAST((SELECT COUNT(*) FROM (SELECT DISTINCT source, bin FROM bins) a) "
        "  AS BIGINT) AS n_bins_total"
    )


sql_query(
    "compliance_delete_impact",
    _delete_impact_sql("size(split(text, ' '))", "DIV"),
    oracle=_delete_impact_sql("len(string_split(text, ' '))", "//"),
    tables=DOCS,
    tags=("versioning", "compliance", "pipeline"),
    doc="right-to-erasure impact audit: a deletion list mapped through "
    "the derived artifacts — docs, chunks (text_chunking law), packed "
    "trainer bins (pack assignment) — counting exactly what must be "
    "rewritten; deterministic packing makes deletes bin-local",
)


# ---- corpus datasheet ------------------------------------------------------


def _datasheet_sql(size_fn: str, distinct_fn: str, split_fn: str, idiv: str) -> str:
    ntok = f"{size_fn}({split_fn}(text, ' '))"
    ndis = f"{size_fn}({distinct_fn}({split_fn}(text, ' ')))"
    return (
        f"WITH base AS (SELECT doc_id, lang, source, md5(text) AS h, "
        f"              {ntok} AS n_tokens, "
        f"              CASE WHEN {ntok} BETWEEN 10 AND 1000 "
        f"                   AND {ndis} * 1000 >= 200 * {ntok} "
        "               THEN 1 ELSE 0 END AS q_ok "
        "              FROM documents) "
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs, "
        "CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources, "
        "CAST(SUM(n_tokens) AS BIGINT) AS total_tokens, "
        f"CAST(SUM(n_tokens) {idiv} COUNT(*) AS BIGINT) AS avg_tokens, "
        "CAST(COUNT(*) - COUNT(DISTINCT h) AS BIGINT) AS n_exact_dup_docs, "
        "CAST(SUM(q_ok) AS BIGINT) AS n_quality_ok, "
        f"CAST(SUM(q_ok) * 1000 {idiv} COUNT(*) AS BIGINT) AS quality_permille "
        "FROM base"
    )


sql_query(
    "corpus_datasheet",
    _datasheet_sql("size", "array_distinct", "split", "DIV"),
    oracle=_datasheet_sql("len", "list_distinct", "string_split", "//"),
    tables=DOCS,
    tags=("versioning", "telemetry", "datasheet"),
    doc="corpus datasheet: the one-row data card (docs/langs/sources/"
    "tokens, exact-dup docs, quality-pass permille) a dataset release "
    "ships with — single pass, map-side combining aggregates",
)


# ---- datasheet cardinalities (KMV) ----------------------------------------

_CARD_K = 64
_CARD_D = 1 << 60  # 60-bit md5-prefix hash domain (operators/kmv.py)


def _card_sql(dialect: str) -> str:
    """One-row cardinality card: exact + KMV-estimated distinct counts
    for the two identities a release datasheet quotes — unique document
    texts (content identity, the dedup denominator) and unique tokens
    (vocabulary size). The KMV k-min rides the portable md5 order
    (functions/hashing.py), so the estimate is bit-identical in DuckDB
    and fully hash-certified; at 100 TB the same estimate folds from
    operators/kmv.py's bounded per-partition summaries while the exact
    COUNT(DISTINCT) column is dropped — the card's estimate column is
    the one that survives scale, the exact/err columns certify it here.
    Complements corpus_datasheet (the certified release card this
    extends with cardinalities — VERDICT r6/r7 stretch)."""
    if dialect == "spark":
        ht = "CAST(conv(substr(md5(text),1,15),16,10) AS BIGINT)"
        hw = "CAST(conv(substr(md5(tok),1,15),16,10) AS BIGINT)"
        toks = ("SELECT explode(split(text, ' ')) AS tok FROM documents")
        idiv = "DIV"
        est = (
            f"CASE WHEN n < {_CARD_K} THEN n "
            f"ELSE CAST((n - 1) * CAST({_CARD_D} AS DECIMAL(38,0)) "
            "DIV hk AS BIGINT) END"
        )
    else:
        ht = "(('0x' || substr(md5(text),1,15))::BIGINT)"
        hw = "(('0x' || substr(md5(tok),1,15))::BIGINT)"
        toks = (
            "SELECT unnest(string_split(text, ' ')) AS tok FROM documents"
        )
        idiv = "//"
        est = (
            f"CASE WHEN n < {_CARD_K} THEN n "
            f"ELSE CAST(((n - 1)::HUGEINT * {_CARD_D}::HUGEINT) "
            "// hk AS BIGINT) END"
        )
    return (
        f"WITH th AS (SELECT DISTINCT {ht} AS h FROM documents), "
        "tk AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM th), "
        f"ts AS (SELECT COUNT(*) AS n, MAX(h) AS hk FROM tk "
        f"       WHERE rn <= {_CARD_K}), "
        f"wh AS (SELECT DISTINCT {hw} AS h FROM ({toks}) x WHERE tok <> ''), "
        "wk AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM wh), "
        f"ws AS (SELECT COUNT(*) AS n, MAX(h) AS hk FROM wk "
        f"       WHERE rn <= {_CARD_K}), "
        "ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS texts_exact "
        "       FROM documents), "
        "wx AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS tokens_exact "
        f"      FROM ({toks}) x WHERE tok <> '') "
        "SELECT ex.n_docs, ex.texts_exact, "
        f"CAST((SELECT {est} FROM ts) AS BIGINT) AS texts_kmv, "
        f"CAST(ABS((SELECT {est} FROM ts) - ex.texts_exact) * 1000 "
        f"  {idiv} ex.texts_exact AS BIGINT) AS texts_err_permille, "
        "wx.tokens_exact, "
        f"CAST((SELECT {est} FROM ws) AS BIGINT) AS tokens_kmv, "
        f"CAST(ABS((SELECT {est} FROM ws) - wx.tokens_exact) * 1000 "
        f"  {idiv} wx.tokens_exact AS BIGINT) AS tokens_err_permille "
        "FROM ex CROSS JOIN wx"
    )


sql_query(
    "datasheet_cardinalities",
    _card_sql("spark"),
    oracle=_card_sql("duck"),
    tables=DOCS,
    tags=("versioning", "telemetry", "datasheet", "sketch"),
    doc="KMV cardinality card extending corpus_datasheet: exact vs "
    "k-min-values estimated distinct texts and tokens with error "
    "permille — the bounded-memory cardinality column a 100 TB data "
    "card actually ships (exact COUNT DISTINCT certifies it at test SF)",
)


# ---- Merkle dataset fingerprint (r14) ---------------------------------------
#
# The provenance primitive a 100 TB corpus release ships: one root hash
# that changes iff ANY byte of ANY document changes, plus per-source
# sub-roots so a mismatch bisects to the source in O(1). An md5 chain
# over ordered leaves is NOT arbitrarily mergeable, so the scalable
# spelling is explicitly HIERARCHICAL: leaf = md5 of the row's content
# string (distributed, embarrassingly parallel); shard root = md5 of
# the ordered leaf concat within a deterministic doc_id range (each
# shard is one bounded reduce); source root = md5 over ordered shard
# roots; global root = md5 over ordered source roots. At 100 TB the
# shard level is the parallel fold and the two top levels touch only
# #shards + #sources rows — no global sort of the corpus, ever.

_MERKLE_SHARD = 64  # docs per shard (fixture-sized; a deployment uses ~1e6)


def _merkle_sql(dialect: str) -> str:
    if dialect == "spark":
        s = "CAST(doc_id AS STRING)"
        n = "CAST(n_chars AS STRING)"
        idiv = "DIV"

        def ordered_md5(key: str, val: str) -> str:
            return (
                f"md5(array_join(transform(array_sort(collect_list("
                f"struct({key}, {val}))), x -> x.{val}), ''))"
            )

    else:
        s = "CAST(doc_id AS VARCHAR)"
        n = "CAST(n_chars AS VARCHAR)"
        idiv = "//"

        def ordered_md5(key: str, val: str) -> str:
            return f"md5(string_agg({val}, '' ORDER BY {key}))"

    leaf = f"md5(concat_ws('|', {s}, lang, source, {n}, text))"
    return (
        f"WITH leaves AS (SELECT source, doc_id {idiv} {_MERKLE_SHARD} "
        f"  AS shard, doc_id, {leaf} AS leaf FROM documents), "
        "shards AS (SELECT source, shard, "
        "  CAST(COUNT(*) AS BIGINT) AS n_docs, "
        f"  {ordered_md5('doc_id', 'leaf')} AS shard_root "
        "  FROM leaves GROUP BY source, shard), "
        "sources AS (SELECT source, "
        "  CAST(SUM(n_docs) AS BIGINT) AS n_docs, "
        "  CAST(COUNT(*) AS BIGINT) AS n_shards, "
        f"  {ordered_md5('shard', 'shard_root')} AS source_root "
        "  FROM shards GROUP BY source), "
        "g AS (SELECT "
        f"  {ordered_md5('source', 'source_root')} AS global_root "
        "  FROM sources) "
        "SELECT s.source, s.n_docs, s.n_shards, s.source_root, "
        "g.global_root FROM sources s CROSS JOIN g ORDER BY s.source"
    )


sql_query(
    "datasheet_merkle_root",
    _merkle_sql("spark"),
    oracle=_merkle_sql("duck"),
    tables=DOCS,
    tags=("versioning", "datasheet", "provenance", "merkle"),
    doc="hierarchical Merkle fingerprint of the corpus (leaf = md5 of "
    "the row content string, shard root = ordered fold per doc_id "
    "range, source root, global root): the release-provenance hash a "
    "data card ships — any byte change anywhere flips the root, and a "
    "mismatch bisects source -> shard without rescanning the corpus",
)
