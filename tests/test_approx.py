"""Approximate aggregates: sketch results within tolerance of exact.

No oracle entries — approximation is engine-specific by nature; the
engine-side guarantee is bounded relative error vs the exact answer.
"""

from pyspark.sql import functions as F

from console_datagen_spark.catalog import register_views


def test_approx_count_distinct_within_5pct(spark, sf_dir):
    ev = register_views(spark, sf_dir, ("events",))["events"]
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id").alias("approx"),
    ).first()
    assert abs(row.approx - row.exact) <= max(1, 0.05 * row.exact)


def test_approx_percentile_brackets_exact(spark, sf_dir):
    ev = register_views(spark, sf_dir, ("events",))["events"]
    row = ev.agg(
        F.expr("percentile(value, 0.5)").alias("exact"),
        F.expr("approx_percentile(value, 0.5, 1000)").alias("approx"),
    ).first()
    assert abs(row.approx - row.exact) <= 0.05 * max(1.0, abs(row.exact))


def test_hll_sketch_agg_roundtrip(spark, sf_dir):
    """Spark 3.5+ HLL sketch build + estimate (mergeable sketches — the
    distributed cardinality path at 100 TB)."""
    ev = register_views(spark, sf_dir, ("events",))["events"]
    est = (
        ev.groupBy("event_type")
        .agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
        .agg(F.expr("hll_union_agg(sk)").alias("merged"))
        .select(F.expr("hll_sketch_estimate(merged)").alias("est"))
        .first()
        .est
    )
    exact = ev.select("user_id").distinct().count()
    assert abs(est - exact) <= max(2, 0.1 * exact)
