"""Bucketed-table helpers: shuffle-free co-located joins (SURVEY scale notes).

At 100 TB the dominant join cost is the shuffle. Persisting both sides
bucketed by the join key means Catalyst plans a SortMergeJoin with **no
Exchange** on either side — the bucket layout IS the partitioning.
tests/test_bucketing.py asserts the Exchange-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (optionally sorted) managed table."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), on)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan
