"""Composed curation/dq queries + compaction utility."""

import pathlib

from pyspark.sql import functions as F

from console_datagen_spark.catalog import register_views
from console_datagen_spark.operators.compaction import (
    compact_for_write,
    estimate_bytes,
)
from console_datagen_spark.plans import all_queries


def test_curation_pipeline_single_scan(spark, sf_dir):
    df = all_queries()["pipeline_curation"].spark(spark, sf_dir)
    rows = df.collect()
    assert rows, "curation pipeline should keep a nonempty corpus"
    assert all(r.docs > 0 for r in rows)
    # the whole pipeline must compile into ONE plan over one scan family
    plan = df._jdf.queryExecution().executedPlan().toString()
    # dedup keeper-join + quality read the docs scan a bounded number of
    # times; anything beyond means a stage materialized outside the plan
    assert plan.count("FileScan parquet") <= 4


def test_dq_checks_clean_fixture(spark, sf_dir):
    row = all_queries()["dq_checks"].spark(spark, sf_dir).first()
    # driver fixtures are referentially clean — every violation counter is 0
    assert row.null_custkeys == 0
    assert row.dup_orderkeys == 0
    assert row.orphan_orders == 0
    assert row.orphan_lineitems == 0
    assert row.nonpositive_qty == 0


def test_dq_checks_detects_violations(spark):
    orders = spark.createDataFrame(
        [(1, 10), (1, 10), (2, None), (3, 99)],
        "o_orderkey LONG, o_custkey LONG",
    )
    customer = spark.createDataFrame([(10,)], "c_custkey LONG")
    lineitem = spark.createDataFrame(
        [(1, 5.0), (77, -1.0)], "l_orderkey LONG, l_quantity DOUBLE"
    )
    orders.createOrReplaceTempView("orders")
    customer.createOrReplaceTempView("customer")
    lineitem.createOrReplaceTempView("lineitem")
    from console_datagen_spark.plans.registry import get_query

    # run the raw SQL against the synthetic views (bypass register_views)
    row = spark.sql(get_query("dq_checks").oracle).first()
    assert row.null_custkeys == 1
    assert row.dup_orderkeys == 1
    assert row.orphan_orders == 1  # custkey 99
    assert row.orphan_lineitems == 1  # orderkey 77
    assert row.nonpositive_qty == 1


def test_compaction_targets_file_count(spark, sf_dir, tmp_path):
    li = register_views(spark, sf_dir, ("lineitem",))["lineitem"]
    est = estimate_bytes(li)
    assert est > 0
    # tiny target → multiple files; huge target → exactly one
    many = compact_for_write(li, target_mb=0.03, compression_ratio=1.0)
    one = compact_for_write(li, target_mb=10_000)
    many.write.mode("overwrite").parquet(str(tmp_path / "many"))
    one.write.mode("overwrite").parquet(str(tmp_path / "one"))
    n_many = len(list(pathlib.Path(tmp_path / "many").glob("part-*")))
    n_one = len(list(pathlib.Path(tmp_path / "one").glob("part-*")))
    assert n_one == 1
    assert n_many > 1

def test_estimate_bytes_uses_plan_statistic(spark, sf_dir, monkeypatch):
    """On a statisted (parquet-scan) frame the estimate must come from
    Catalyst's sizeInBytes — zero jobs, no count/sample pass."""
    from pyspark.sql import DataFrame

    from console_datagen_spark.operators.compaction import plan_size_in_bytes

    li = register_views(spark, sf_dir, ("lineitem",))["lineitem"]
    stat = plan_size_in_bytes(li)
    assert stat is not None and stat > 0

    def _boom(self):
        raise AssertionError("estimate_bytes ran a job on a statisted frame")

    monkeypatch.setattr(DataFrame, "count", _boom)
    monkeypatch.setattr(DataFrame, "first", _boom)
    assert estimate_bytes(li) == stat


def test_estimate_bytes_sample_fallback(spark, monkeypatch):
    """Frames without a usable statistic fall back to count+sample."""
    from console_datagen_spark.operators import compaction

    df = spark.range(100).selectExpr("id", "repeat('x', 10) AS pad")
    monkeypatch.setattr(compaction, "plan_size_in_bytes", lambda _df: None)
    est = compaction.estimate_bytes(df)
    assert est > 100  # 100 rows x nonzero JSON width


def test_compact_batch_store_folds_old_batches(spark, tmp_path):
    """compact_batch_store folds all but the newest keep_last batch
    partitions into _batch=-1, preserves every row, and bounds the
    directory count — the maintenance pass for the streaming ingest
    stores (one dir per micro-batch otherwise grows forever)."""
    import glob

    from console_datagen_spark.operators.compaction import compact_batch_store

    path = str(tmp_path / "store")
    for b in range(10):
        (
            spark.range(b * 100, b * 100 + 100)
            .selectExpr("id AS doc_id", "CAST(id % 7 AS INT) AS bucket")
            .withColumn("_batch", F.lit(b))
            .repartition(1)
            .write.mode("append")
            .partitionBy("_batch")
            .parquet(path)
        )
    # materialize the before-state: compaction deletes the underlying
    # files, so a lazy frame would re-scan paths that no longer exist
    before_ids = {
        r.doc_id for r in spark.read.parquet(path).select("doc_id").collect()
    }
    total = len(before_ids)
    out = compact_batch_store(spark, path, keep_last=3)
    assert out["folded_batches"] == 7 and out["rows"] == 700
    after = spark.read.parquet(path)
    assert after.count() == total
    # exact row preservation, not just counts
    after_ids = {r.doc_id for r in after.select("doc_id").collect()}
    assert after_ids == before_ids
    dirs = sorted(
        d.split("=")[-1] for d in glob.glob(f"{path}/_batch=*")
    )
    assert dirs == ["-1", "7", "8", "9"]
    # consolidated partition holds ONE file
    assert len(glob.glob(f"{path}/_batch=-1/part-*.parquet")) == 1
    # idempotent: a second pass with nothing old enough is a no-op
    assert compact_batch_store(spark, path, keep_last=3) == {
        "folded_batches": 0,
        "rows": 0,
    }
    # a later pass folds newer batches INTO the existing consolidated dir
    out2 = compact_batch_store(spark, path, keep_last=1)
    assert out2["folded_batches"] == 2
    assert spark.read.parquet(path).count() == total


def test_compact_batch_store_clustered_layout(spark, tmp_path):
    """With cluster_cols (the band index shape: bucket x _batch), the
    consolidated write keeps the bucket partitioning and lands one file
    per (bucket, -1) directory."""
    import glob

    from console_datagen_spark.operators.compaction import compact_batch_store

    path = str(tmp_path / "idx")
    for b in range(6):
        (
            spark.range(b * 50, b * 50 + 50)
            .selectExpr("id AS doc_id", "CAST(id % 4 AS INT) AS bucket")
            .withColumn("_batch", F.lit(b))
            .repartition(F.col("bucket"))
            .write.mode("append")
            .partitionBy("bucket", "_batch")
            .parquet(path)
        )
    total = spark.read.parquet(path).count()
    out = compact_batch_store(spark, path, keep_last=2, cluster_cols=["bucket"])
    assert out["folded_batches"] == 4
    assert spark.read.parquet(path).count() == total
    for bdir in glob.glob(f"{path}/bucket=*"):
        cons = glob.glob(f"{bdir}/_batch=-1/part-*.parquet")
        assert len(cons) == 1, bdir
        live = glob.glob(f"{bdir}/_batch=*")
        assert len(live) <= 3  # -1 + the 2 kept batches
