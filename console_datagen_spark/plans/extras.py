"""Remaining inventory coverage: A2 collect-list, scalar regexp battery,
and the multimodal feature pipeline (rows-only check — Pandas-UDF decode
is not batch-SQL-expressible, SURVEY §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views
from ..operators import multimodal as M
from .registry import df_query, sql_query

# A2: group-by + collect list (DataGenerator.java:256-258 groupingBy+toList);
# sorted for determinism (collect order is not defined in either engine)
sql_query(
    "agg_collect_list",
    "SELECT event_type, sort_array(collect_set(user_id)) AS users "
    "FROM events WHERE user_id < 20 GROUP BY event_type ORDER BY event_type",
    oracle=(
        "SELECT event_type, list_sort(list(DISTINCT user_id)) AS users "
        "FROM events WHERE user_id < 20 GROUP BY event_type ORDER BY event_type"
    ),
    tables=("events",),
    tags=("agg", "collect"),
    doc="A2: grouped id-list collection (DataGenerator.java:256-258)",
)

# §2.9 string battery #2: quote-strip regex (ClientConfigFactory.java:133-135),
# split + part extraction, concat_ws join (CCF:165, 188-191)
sql_query(
    "scalar_string_battery",
    "SELECT event_id, "
    "regexp_replace(concat('\"', event_type, '\"'), '(^[\"\\'])|([\"\\']$)', '') "
    "AS unquoted, "
    "element_at(split(props, ':'), 1) AS json_head, "
    "concat_ws('|', event_type, CAST(user_id AS STRING), CAST(event_id AS STRING)) "
    "AS joined "
    "FROM events WHERE event_id < 50 ORDER BY event_id",
    oracle=(
        "SELECT event_id, "
        # DuckDB regexp_replace is first-match unless the 'g' flag is given
        "regexp_replace(concat('\"', event_type, '\"'), '(^[\"''])|([\"'']$)', '', 'g') "
        "AS unquoted, "
        "string_split(props, ':')[1] AS json_head, "
        "concat_ws('|', event_type, CAST(user_id AS VARCHAR), "
        "          CAST(event_id AS VARCHAR)) AS joined "
        "FROM events WHERE event_id < 50 ORDER BY event_id"
    ),
    tables=("events",),
    tags=("scalar",),
    doc="§2.9: quote-strip regex / split / concat_ws (ClientConfigFactory.java:133-191)",
)


# part-table coverage: LIKE filter + grouped stats (the one fixture table
# not otherwise exercised)
sql_query(
    "q_part_type_stats",
    "SELECT p_brand, COUNT(*) AS n, "
    "CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) "
    "AS total_price, "
    "CAST(MAX(p_size) AS INT) AS max_size "
    "FROM part WHERE p_type LIKE 'ECO%' "
    "GROUP BY p_brand ORDER BY p_brand",
    tables=("part",),
    tags=("agg", "filter"),
    doc="part-table scan: LIKE predicate pushdown + grouped decimal stats",
)


def _kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import kmeans_iterate

    emb = register_views(spark, sf_dir, ("embeddings",))["embeddings"]
    return kmeans_iterate(emb, k=5, iterations=2).orderBy("vec_id")


df_query(
    "sim_kmeans_assign",
    _kmeans,
    oracle=None,  # iterative float means: rows-only check (SURVEY §5 clause)
    tables=("embeddings",),
    tags=("similarity", "iterative"),
    doc="k-means (2 Lloyd iterations) cluster assignment — iterative algorithm tier",
)


def _mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = register_views(spark, sf_dir, ("documents",))["documents"]
    media = M.synth_media(docs, "image", n_bytes=256)
    return M.extract_features(media).orderBy("doc_id")


df_query(
    "mm_features",
    _mm_features,
    oracle=None,  # Pandas-UDF decode: rows-only check by design
    tables=("documents",),
    tags=("multimodal",),
    doc="multimodal decode+feature-extract via mapInPandas (stubbed codec)",
)
