"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship join+agg query (Q8) on sf0.001.
``queries()`` / ``oracle_sql()`` expose the full declared-query registry
from ``console_datagen_spark.plans`` — one entry per implemented operator
class from SURVEY.md §2, each with a DuckDB oracle unless the op is not
batch-SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from console_datagen_spark.plans import all_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spec = all_queries()["q8_inner_join"]
    return spec.spark(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
