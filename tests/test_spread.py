"""spread() must never force physical planning (no .rdd probe) unless
explicitly asked — it runs several times per composed query build."""

from __future__ import annotations

import pyspark.sql
import pytest
from pyspark.sql import functions as F

from console_datagen_spark.catalog import register_views
from console_datagen_spark.functions.spread import spread


@pytest.fixture
def forbid_rdd(monkeypatch):
    """Make any .rdd access explode so the test proves spread() stayed
    on the analyzed plan."""

    def _boom(self):
        raise AssertionError("spread() materialized an RDD (physical planning)")

    monkeypatch.setattr(pyspark.sql.DataFrame, "rdd", property(_boom))


def test_file_backed_scan_spreads_without_rdd(spark, sf_dir, forbid_rdd):
    docs = register_views(spark, sf_dir, ("documents",))["documents"]
    target = spark.sparkContext.defaultParallelism
    out = spread(docs)
    # sf fixtures are single-file tables -> the guard must insert the
    # exchange up to the session parallelism, using only inputFiles().
    assert "Repartition" in out._jdf.queryExecution().logical().toString() or (
        len(docs.inputFiles()) >= target
    )


def test_non_file_frame_is_untouched_by_default(spark, forbid_rdd):
    df = spark.range(10).select(F.col("id"))
    assert spread(df) is df


def test_probe_plan_opt_in_still_works(spark):
    df = spark.range(10, numPartitions=2).select(F.col("id"))
    out = spread(df, min_parallelism=8, probe_plan=True)
    assert out.rdd.getNumPartitions() == 8


def test_caller_supplied_splits_skip_all_probes(spark, forbid_rdd):
    df = spark.range(10).select(F.col("id"))
    out = spread(df, min_parallelism=8, n_splits=2)
    assert "Repartition" in out._jdf.queryExecution().logical().toString()
    assert spread(df, min_parallelism=8, n_splits=64) is df
