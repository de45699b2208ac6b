"""Bucketed-table joins must plan without a shuffle Exchange."""

import pytest
from pyspark.sql import functions as F

from console_datagen_spark.catalog import register_views
from console_datagen_spark.operators import bucketing as B


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # warehouse dir is a static conf; tables land in ./spark-warehouse
    # (gitignored) and are dropped on teardown
    tables = register_views(spark, sf_dir, ("orders", "lineitem"))
    B.write_bucketed(
        tables["orders"], "orders_b", ["o_orderkey"], 8, ["o_orderkey"]
    )
    B.write_bucketed(
        tables["lineitem"],
        "lineitem_b",
        ["l_orderkey"],
        8,
        ["l_orderkey"],
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    # at fixture scale Catalyst would (rightly) broadcast instead; disable
    # broadcast to exercise the big-big path bucketing exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(orders_b).join(
            spark.table(lineitem_b),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # co-located buckets on both sides: SortMergeJoin with NO shuffle
    assert "SortMergeJoin" in plan, plan[:1500]
    assert "Exchange" not in plan, f"join subtree shuffled:\n{plan[:2000]}"


def test_bucketed_join_correct(spark, sf_dir, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    got = (
        spark.table(orders_b)
        .join(spark.table(lineitem_b), F.col("o_orderkey") == F.col("l_orderkey"))
        .count()
    )
    tables = register_views(spark, sf_dir, ("orders", "lineitem"))
    want = (
        tables["orders"]
        .join(tables["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .count()
    )
    assert got == want
