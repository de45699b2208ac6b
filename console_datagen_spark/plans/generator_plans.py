"""Declared generator queries (SURVEY §2.2) — even the record generator is
DuckDB-oracle-checked, because every field is a deterministic pure-SQL
function of the row id (see sources/generator.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import ensure_engine_conf
from ..sources.generator import gen_sql
from .registry import df_query, sql_query

_GEN_N = 200


def _gen_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_engine_conf(spark)
    return spark.sql(gen_sql("spark", _GEN_N))


df_query(
    "gen_records",
    _gen_records,
    oracle=gen_sql("duck", _GEN_N),
    tags=("generator",),
    doc=(
        "G3-G8: seeded record generation — JSON key/value, base64 payload, "
        "headers, round-robin topic (DataGenerator.java:455-535)"
    ),
)

# G1: the sawtooth rate law evaluated over 120 one-second ticks
sql_query(
    "gen_rate_law",
    "SELECT id AS tick, "
    "CAST(100 * (((1704067200000 + id * 1000) DIV 10000) % 5) + 10 AS BIGINT) "
    "AS rate FROM range(120) ORDER BY tick",
    oracle=(
        "SELECT id AS tick, "
        "CAST(100 * (((1704067200000 + id * 1000) // 10000) % 5) + 10 AS BIGINT) "
        "AS rate FROM range(120) t(id) ORDER BY tick"
    ),
    tags=("generator", "rate"),
    doc="G1: rate(t)=100*((t_ms/10000)%5)+10 sawtooth (DataGenerator.java:458-459)",
)

# G10: the deterministic topic/group namespace as a relational query
sql_query(
    "gen_topic_names",
    "SELECT g, gt, t, "
    "format_string('console_datagen_%03d-%s', g, "
    "              concat(gt, '-', lower(conv(CAST(t + 10 AS STRING), 10, 36)))) "
    "AS topic, "
    "format_string('console-datagen-group-%s-%d', gt, g) AS group_id "
    "FROM (SELECT id AS g FROM range(3)) "
    "CROSS JOIN (SELECT explode(array('consumer','share','streams')) AS gt) "
    "CROSS JOIN (SELECT id AS t FROM range(4)) "
    "ORDER BY gt, g, t",
    oracle=(
        "SELECT g, gt, t, "
        "printf('console_datagen_%03d-%s', g, "
        "       concat(gt, '-', lower(to_base(t + 10, 36)))) AS topic, "
        "printf('console-datagen-group-%s-%d', gt, g) AS group_id "
        "FROM (SELECT id AS g FROM range(3) r1(id)) "
        "CROSS JOIN (SELECT unnest(['consumer','share','streams']) AS gt) "
        "CROSS JOIN (SELECT id AS t FROM range(4) r2(id)) "
        "ORDER BY gt, g, t"
    ),
    tags=("generator", "naming"),
    doc="G10: base-36 suffix + printf topic/group naming (DataGenerator.java:197-210)",
)
