"""Python UDTF record-burst expansion (SURVEY §2.10, §3.2).

The reference's produce loop turns one 1-second tick into rate(t) records
(DataGenerator.java:455-535). The engine's primary path expresses that
thinning declaratively (streaming/generator_stream.sawtooth_thin — faster:
stays in codegen). This module provides the equivalent as a Python UDTF
(Spark 3.5+ lateral table function), covering the one UDF-shaped surface
class the declarative path doesn't demonstrate: 1 row in → N rows out with
Python-side logic.

Use when burst logic needs a Python library (e.g. a tokenizer or sampler
per tick); otherwise prefer the declarative thinning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import udtf

from ..functions.rate import rate_for_millis_py


@udtf(returnType="record_id BIGINT, tick_ms BIGINT, idx INT")
class BurstExpand:
    """One (tick_ms,) row → rate(tick_ms) record stubs."""

    def eval(self, tick_ms: int):  # noqa: D102
        rate = rate_for_millis_py(tick_ms)
        base = tick_ms * 1000  # record ids unique across ticks
        for i in range(rate):
            yield base + i, tick_ms, i


def expand_ticks(spark: SparkSession, ticks: DataFrame) -> DataFrame:
    """Apply the burst UDTF laterally to a (tick_ms BIGINT) frame."""
    ticks.createOrReplaceTempView("_burst_ticks")
    spark.udtf.register("burst_expand", BurstExpand)
    return spark.sql(
        "SELECT t.record_id, t.tick_ms, t.idx "
        "FROM _burst_ticks, LATERAL burst_expand(tick_ms) t"
    )
