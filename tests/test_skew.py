"""Salted aggregation/join equivalence vs unsalted plans."""

import pytest
from pyspark.sql import functions as F

from console_datagen_spark.catalog import register_views
from console_datagen_spark.operators import skew as S


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of rows on one hot key."""
    hot = spark.range(9000).select(
        F.lit("hot").alias("k"), (F.col("id") % 100).alias("v")
    )
    cold = spark.range(1000).select(
        F.concat(F.lit("cold"), (F.col("id") % 50).cast("string")).alias("k"),
        (F.col("id") % 100).alias("v"),
    )
    return hot.union(cold)


def test_salted_count_matches_plain(spark, skewed):
    plain = {r.k: r["count"] for r in skewed.groupBy("k").count().collect()}
    salted = {r.k: r["count"] for r in S.salted_count(skewed, ["k"]).collect()}
    assert salted == plain
    assert salted["hot"] == 9000


def test_salted_agg_matches_plain(spark, skewed):
    plain = {
        r.k: (r["count"], r.sum_v, r.min_v, r.max_v)
        for r in skewed.groupBy("k")
        .agg(
            F.count("*").alias("count"),
            F.sum("v").alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
        .collect()
    }
    salted = {
        r.k: (r["count"], r.sum_v, r.min_v, r.max_v)
        for r in S.salted_agg(
            skewed, ["k"], sums=["v"], mins=["v"], maxs=["v"]
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"cold{i}", f"C{i}") for i in range(50)],
        "k STRING, label STRING",
    )
    plain = skewed.join(dim, ["k"]).groupBy("label").count()
    salted = S.salted_join(skewed, dim, ["k"]).groupBy("label").count()
    assert {(r.label, r["count"]) for r in plain.collect()} == {
        (r.label, r["count"]) for r in salted.collect()
    }


def test_salted_join_outer(spark, skewed):
    dim = spark.createDataFrame([("hot", "H")], "k STRING, label STRING")
    out = S.salted_join(skewed, dim, ["k"], how="left")
    assert out.count() == skewed.count()  # left join preserves all rows
    assert out.where(F.col("label").isNull()).count() == 1000  # cold rows


def test_salted_count_on_fixture(spark, sf_dir):
    ev = register_views(spark, sf_dir, ("events",))["events"]
    plain = {r.event_type: r["count"] for r in ev.groupBy("event_type").count().collect()}
    salted = {
        r.event_type: r["count"]
        for r in S.salted_count(ev, ["event_type"], salt_buckets=8).collect()
    }
    assert salted == plain
