"""Approximate aggregation tier: HLL distinct + quantile sketches.

Sketch outputs are engine-specific (Spark's HLL++ and DuckDB's approx
algorithms differ), so these are certified by bounded relative error
against the exact answer, not by the cross-engine hash oracle — the same
split SURVEY §5 prescribes for float similarity scores.
"""

from pyspark.sql import functions as F

from console_datagen_spark.catalog import register_views


def test_approx_count_distinct_bounded_error(spark, sf_dir):
    ev = register_views(spark, sf_dir, ("events",))["events"]
    exact = ev.select(F.count_distinct("user_id")).first()[0]
    approx = ev.select(F.approx_count_distinct("user_id", rsd=0.02)).first()[0]
    assert abs(approx - exact) / exact < 0.05


def test_approx_percentile_bounded_error(spark, sf_dir):
    ev = register_views(spark, sf_dir, ("events",))["events"]
    exact = ev.selectExpr("percentile(value, 0.5)").first()[0]
    approx = ev.selectExpr("approx_percentile(value, 0.5, 10000)").first()[0]
    assert abs(approx - exact) <= max(1.0, 0.02 * abs(exact))


def test_hll_sketch_agg_merge(spark, sf_dir):
    """Spark 3.5+ hll_sketch_agg/hll_union_agg: sketches built on disjoint
    halves and merged must estimate the full distinct count."""
    ev = register_views(spark, sf_dir, ("events",))["events"]
    exact = ev.select(F.count_distinct("user_id")).first()[0]
    halves = ev.withColumn("h", F.col("event_id") % 2)
    sketches = halves.groupBy("h").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).first()["est"]
    assert abs(merged - exact) / exact < 0.05
