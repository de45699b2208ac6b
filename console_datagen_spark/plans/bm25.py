"""BM25 lexical retrieval — hash-exact via integer fixed-point math.

The rag tier's lexical ranker (``rag_hybrid_rrf``'s kw leg) is raw
distinct-token overlap; production lexical retrieval is BM25 (Robertson
& Spärck Jones / Okapi, the default in Lucene, Elasticsearch, Vespa and
every hybrid-RAG stack). Textbook BM25 is float + ln, which the oracle
gate cannot certify bit-exactly across engines — so this module derives
an EXACT-INTEGER BM25 whose every step is deterministic BIGINT
arithmetic on both Spark and DuckDB:

- **idf** = ln-family dampening via the fixed-point binary log of the
  Lucene-positive ratio ``(2N+2)/(2df+1)`` (== 1 + (N-df+.5)/(df+.5),
  always >= 1 so the log is never negative), computed by
  :mod:`..functions.intlog` in units of 2^-10 bits. Ranking is
  invariant to the log base, so "bits" stands in for "nats" exactly.
- **tf saturation + length norm** with k1=1.2, b=0.75 folded into one
  integer rational: k1*(1-b+b*dl/avgdl) over common denominator
  20*avgdl gives term = 44*tf*avgdl / (20*tf*avgdl + 6*avgdl + 18*dl),
  with avgdl carried as ``avgdl_milli = (1000*total_len) DIV n_docs``
  so the per-term score is one integer multiply-divide:
  ``idf_fp * 44 * tf * avgdl_milli DIV
  (20*tf*avgdl_milli + 6*avgdl_milli + 18*dl*1000)``.

Headroom: idf_fp < 2^16 (e <= 63 at any corpus size), tf <= dl (fixture
docs ~200 tokens; 100 TB web docs ~10^4), avgdl_milli ~ 10^5-10^7 =>
term numerator < 2^16 * 44 * 10^4 * 10^7 ~ 3e17 < 2^63. Unlike a
total-length formulation, nothing grows with CORPUS size — only with
document length — so the arithmetic survives 100 TB unchanged.

Scale shape: ``toks`` (doc_id, tid, tf) is the one corpus-sized frame.
The Spark side tokenizes ONCE — the per-token md5 id is the dominant
cost, and a WITH-CTE spelling re-runs it for every reference (Catalyst
inlines CTEs; measured 2.8 s -> see PROGRESS.jsonl) — so the DataFrame
path materializes toks via localCheckpoint and the downstream SQL reads
the materialized blocks five times instead of re-tokenizing. Everything
above toks is dim-sized: df→idf chains run over the distinct-df frame
(<= max df rows — broadcast), queries are _NQ docs (broadcast), scoring
is one equi-join on tid + one (qid, did) hash aggregate + a per-qid
top-k window (WindowGroupLimit pushes the partial). No cartesian
anywhere; candidate cost is the sum over query tokens of their postings
— the same asymptotics as an inverted index. At cluster scale the
localCheckpoint becomes a persisted toks table (one tokenize, many
queries), which is exactly how a production inverted index amortizes.

Reference anchor: north-star (LLM/RAG pipeline) scope — the reference
(streamshub/console-datagen) has no retrieval surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views
from ..functions.hashing import token_id_sql_duck, token_id_sql_spark
from ..functions.intlog import log2_fp_ctes
from .registry import df_query

_NQ = 10  # query docs (doc_id < _NQ), same discipline as rag_hybrid_rrf
_TOPK = 5

_TOKS_VIEW = "bm25_toks_v"


def _toks_sql(dialect: str) -> str:
    """(doc_id, tid, tf): term frequency per (doc, 60-bit md5 token id)."""
    if dialect == "spark":
        tid = token_id_sql_spark("t")
        src = (
            "SELECT doc_id, "
            f"explode(transform(split(text, ' '), t -> {tid})) AS tid "
            "FROM documents"
        )
    else:
        tid = token_id_sql_duck("t")
        src = (
            "SELECT doc_id, unnest(list_transform("
            f"string_split(text, ' '), t -> {tid})) AS tid FROM documents"
        )
    return (
        f"SELECT doc_id, tid, COUNT(*) AS tf FROM ({src}) raw "
        "GROUP BY doc_id, tid"
    )


def _bm25_ctes(dialect: str, toks: str) -> str:
    """Shared WITH-list body: corpus stats -> integer idf -> term scores.

    ``toks`` is the name the (doc_id, tid, tf) frame is visible under —
    an inline CTE for DuckDB (which materializes CTEs once), a
    checkpointed temp view for Spark (which would re-tokenize per
    reference otherwise).
    """
    idiv = "DIV" if dialect == "spark" else "//"
    return (
        f"dl AS (SELECT doc_id, SUM(tf) AS dl FROM {toks} GROUP BY doc_id), "
        "stats AS (SELECT COUNT(*) AS n, SUM(dl) AS tl FROM dl), "
        f"avg AS (SELECT (1000 * tl) {idiv} n AS avgdl_milli FROM stats), "
        f"df AS (SELECT tid, COUNT(*) AS df FROM {toks} GROUP BY tid), "
        # distinct df values only: the log chain runs on a tiny frame
        "dfv AS (SELECT df, (2 * n + 2) AS x, (2 * df + 1) AS y "
        "FROM (SELECT DISTINCT df FROM df) d CROSS JOIN stats), "
        + log2_fp_ctes("dfv", "df", "x", "y", dialect, out="idf")
        + ", "
        f"qt AS (SELECT doc_id AS qid, tid FROM {toks} WHERE doc_id < "
        f"{_NQ}), "
        "term AS (SELECT qt.qid, t.doc_id AS did, "
        "(i.lg_fp * 44 * t.tf * a.avgdl_milli) "
        f"{idiv} (20 * t.tf * a.avgdl_milli + 6 * a.avgdl_milli "
        "+ 18 * d.dl * 1000) AS ts "
        f"FROM qt JOIN {toks} t ON qt.tid = t.tid AND t.doc_id <> qt.qid "
        "JOIN df f ON f.tid = qt.tid "
        "JOIN idf i ON i.df = f.df "
        "JOIN dl d ON d.doc_id = t.doc_id "
        "CROSS JOIN avg a), "
        "sc AS (SELECT qid, did, SUM(ts) AS score_fp FROM term "
        "GROUP BY qid, did)"
    )


_TOPK_TAIL = (
    "SELECT qid AS query_id, did AS doc_id, "
    "CAST(score_fp AS BIGINT) AS bm25_fp, CAST(rnk AS INT) AS rnk "
    "FROM (SELECT qid, did, score_fp, ROW_NUMBER() OVER ("
    "PARTITION BY qid ORDER BY score_fp DESC, did) AS rnk FROM sc) r "
    f"WHERE rnk <= {_TOPK} ORDER BY query_id, rnk"
)


def _gauge_tail(dialect: str, toks: str) -> str:
    return (
        "bm AS (SELECT qid, did FROM (SELECT qid, did, "
        "ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score_fp DESC, did) "
        f"AS rnk FROM sc) x WHERE rnk <= {_TOPK}), "
        # raw distinct-token overlap ranker (the rag_hybrid_rrf kw leg)
        "ov AS (SELECT qt.qid, t.doc_id AS did, COUNT(*) AS shared "
        f"FROM qt JOIN {toks} t ON qt.tid = t.tid AND t.doc_id <> qt.qid "
        "GROUP BY qt.qid, t.doc_id), "
        "kw AS (SELECT qid, did FROM (SELECT qid, did, "
        "ROW_NUMBER() OVER (PARTITION BY qid ORDER BY shared DESC, did) "
        f"AS rnk FROM ov) x WHERE rnk <= {_TOPK}) "
        "SELECT bm.qid AS query_id, "
        "CAST(COUNT(kw.did) AS BIGINT) AS n_shared_top5 "
        "FROM bm LEFT JOIN kw ON bm.qid = kw.qid AND bm.did = kw.did "
        "GROUP BY bm.qid ORDER BY query_id"
    )


def _spark_runner(tail_fn):
    """Tokenize once (localCheckpoint), then run the CTE chain over the
    materialized frame."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, ("documents",))
        toks = spark.sql(_toks_sql("spark")).localCheckpoint(eager=False)
        toks.createOrReplaceTempView(_TOKS_VIEW)
        return spark.sql(
            "WITH "
            + _bm25_ctes("spark", _TOKS_VIEW)
            + (", " if tail_fn is not _topk_tail_fn else " ")
            + tail_fn("spark", _TOKS_VIEW)
        )

    return run


def _topk_tail_fn(dialect: str, toks: str) -> str:  # noqa: ARG001
    return _TOPK_TAIL


def _duck_sql(tail_fn) -> str:
    sep = ", " if tail_fn is not _topk_tail_fn else " "
    return (
        f"WITH toks AS ({_toks_sql('duck')}), "
        + _bm25_ctes("duck", "toks")
        + sep
        + tail_fn("duck", "toks")
    )


df_query(
    "rag_bm25_topk",
    _spark_runner(_topk_tail_fn),
    oracle=_duck_sql(_topk_tail_fn),
    tables=("documents",),
    tags=("rag", "text", "retrieval", "topk", "bm25"),
    doc="BM25 top-5 per query doc, hash-exact: idf from the integer "
    "fixed-point binary log of (2N+2)/(2df+1) (ranking is log-base "
    "invariant), Robertson tf-saturation k1=1.2 b=0.75 as one exact "
    "integer rational with avgdl in milli-tokens — zero floats, zero "
    "transcendental ULP risk; Spark tokenizes once into a checkpointed "
    "postings frame, the inverted-index amortization",
)

df_query(
    "rag_bm25_overlap_gauge",
    _spark_runner(_gauge_tail),
    oracle=_duck_sql(_gauge_tail),
    tables=("documents",),
    tags=("rag", "text", "retrieval", "gauge"),
    doc="per-query |BM25 top-5 ∩ raw-overlap top-5|: certifies the two "
    "lexical rankers actually disagree (the premise rank fusion rests "
    "on), reusing the BM25 postings frame so both rankers read one "
    "tokenize pass",
)
