"""Env-gated scale stress: 20M generated records through agg + dedup paths.

Run with SPARK_GRAFT_STRESS=1 — excluded from the default suite to keep it
fast. Verifies the generator and the hash-groupBy dedup path have no
cliff at 20x the bench volume (partition sizing, codegen, shuffle spill).
"""

import os
import time

import pytest
from pyspark.sql import functions as F

from console_datagen_spark.sources.generator import generate_batch

STRESS = os.environ.get("SPARK_GRAFT_STRESS") == "1"

pytestmark = pytest.mark.skipif(not STRESS, reason="set SPARK_GRAFT_STRESS=1")


def test_20m_generate_and_dedup(spark):
    n = 20_000_000
    t0 = time.perf_counter()
    recs = generate_batch(spark, n).select("record_id", "key_json", "topic")
    agg = (
        recs.groupBy("topic")
        .agg(
            F.count("*").alias("cnt"),
            F.countDistinct("key_json").alias("distinct_keys"),
        )
        .collect()
    )
    dt = time.perf_counter() - t0
    total = sum(r.cnt for r in agg)
    assert total == n
    # key space is ~1000*100*10000 combos — dups exist but cardinality high
    assert all(r.distinct_keys > r.cnt // 100 for r in agg)
    rate = n / dt
    print(f"\n20M gen+agg in {dt:.1f}s = {rate:,.0f} rec/s")
    assert rate > 50_000  # far above any cliff
