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


def test_misra_gries_guarantees_hold_under_repartitioning(spark, sf_dir):
    """MG guarantee booleans must hold for ANY partitioning; the summary
    CONTENTS may differ, the certified contract may not."""
    from console_datagen_spark.catalog import register_views
    from console_datagen_spark.operators.heavy_hitters import (
        heavy_hitters_check,
        mg_merge,
        mg_partition_summaries,
    )

    ev = register_views(spark, sf_dir, ("events",))["events"]
    for parts in (1, 7):
        row = heavy_hitters_check(ev.repartition(parts), "event_type", k=4).head()
        assert row.all_heavy_found and row.no_overestimate
        assert row.underestimate_within_bound
        assert row.n_true_heavy >= 1  # the fixture has hot event types
    # summary stays within k counters
    s = mg_merge(mg_partition_summaries(ev.repartition(7), "event_type", 4), 4)
    assert s.count() <= 4


def test_misra_gries_known_stream(spark):
    from console_datagen_spark.operators.heavy_hitters import (
        mg_merge,
        mg_partition_summaries,
    )

    # 6 a's, 3 b's, 1 c in one partition with k=2: c must be squeezed out
    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)]
    df = spark.createDataFrame(rows, "key string").coalesce(1)
    got = {
        r.key: r.est
        for r in mg_merge(mg_partition_summaries(df, "key", 2), 2).collect()
    }
    assert set(got) <= {"a", "b"}
    assert got["a"] >= 6 - 10 // 3  # est >= true - N/(k+1)


def test_misra_gries_streaming_across_batches(spark, tmp_path):
    """The streaming sketch accumulates across micro-batches and keeps the
    MG guarantee over the TOTAL stream seen so far."""
    import shutil

    from console_datagen_spark.operators.heavy_hitters import mg_stream

    src = tmp_path / "src"
    src.mkdir()

    def drop_file(rows, name):
        stage = tmp_path / f"_stage_{name}"
        spark.createDataFrame(rows, "key string").coalesce(1).write.parquet(
            str(stage), mode="overwrite"
        )
        shutil.move(
            str(next(stage.glob("part-*.parquet"))), str(src / f"{name}.parquet")
        )

    emitted = []

    def run_once():
        stream = spark.readStream.schema("key string").parquet(str(src))
        q = (
            mg_stream(stream, "key", k=2)
            .writeStream.foreachBatch(lambda b, _: emitted.extend(b.collect()))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drop_file([("a",)] * 4 + [("b",)] * 2, "b1")
    run_once()
    drop_file([("a",)] * 3 + [("c",)] * 2, "b2")
    emitted.clear()
    run_once()
    got = {r.key: r.est for r in emitted}
    # totals: a=7, b=2, c=2 over N=11, k=2 -> bound N/(k+1)=3
    assert "a" in got  # 7 > 3: guaranteed present
    assert got["a"] >= 7 - 11 // 3 and got["a"] <= 7
