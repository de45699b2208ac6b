"""Interleaved same-session A/B: dedup_keepers_capped old vs new verify.

Variants, each run as the full registered pipeline (cold cache per run):
  fan   — committed r13 spelling: unheld ids, fan-join verify
  arr   — r14 spelling: held ids, packed-array verify
  arrnh — array verify, ids NOT held (is the extra hold job the cost?)
Interleaves RUNS rounds of each; prints sorted samples per variant.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench
from console_datagen_spark.caching import CacheSlot, release_all_cache_slots
from console_datagen_spark.catalog import register_views
from console_datagen_spark.operators import dedup as D
from console_datagen_spark.plans.dedup import (
    _BUCKET_CAP,
    _JACCARD_PERMILLE,
    _K,
    _ROWS_PER_BAND,
    DOCS,
)
from console_datagen_spark.session import get_spark

SF = bench.SF_DIR
_slot = CacheSlot()


def _fan_verify(d, candidates, threshold):
    """The committed r13 fan-join verify, inlined for the A/B."""
    sizes = d.groupBy("doc_id").agg(F.count("*").alias("sz"))
    fan = candidates.select("doc_a", "doc_b").join(
        d.select(F.col("doc_id").alias("doc_a"), "tid"), "doc_a"
    )
    pairs = (
        fan.join(d.select(F.col("doc_id").alias("doc_b"), "tid"), ["doc_b", "tid"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.expr("CAST(inter * 1000 DIV (sza + szb - inter) AS BIGINT)").alias(
                "jaccard_permille"
            ),
        )
        .where(F.col("jaccard_permille") >= threshold)
    )


def build(spark, variant):
    _slot.release()
    docs = register_views(spark, SF, DOCS)["documents"]
    ids = D.doc_shingle_ids(docs)
    if variant != "fan" and variant != "arrnh":
        ids = _slot.hold(ids)
    cand = D.lsh_candidate_pairs_capped(
        docs, k=_K, rows_per_band=_ROWS_PER_BAND,
        bucket_cap=_BUCKET_CAP, ids_df=ids,
    )
    if variant == "fan":
        pairs = _fan_verify(ids, cand, _JACCARD_PERMILLE)
    else:
        pairs = D.ngram_jaccard_pairs(
            docs, threshold_permille=_JACCARD_PERMILLE,
            candidates=cand, ids_df=ids,
        )
    labels = D.dup_components(pairs)
    drops = labels.where(F.col("doc_id") != F.col("component")).select("doc_id")
    return (
        docs.join(drops, "doc_id", "left_anti")
        .groupBy("lang")
        .agg(F.count("*").cast("long").alias("n_kept"))
        .orderBy("lang")
    )


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="ab-keepers",
                      extra_conf={"spark.driver.memory": "8g"})
    register_views(spark, SF, DOCS)["documents"].count()  # warm
    out = {"fan": [], "arr": [], "arrnh": []}
    for _ in range(runs):
        for v in ("fan", "arr", "arrnh"):
            t0 = time.perf_counter()
            build(spark, v).write.format("noop").mode("overwrite").save()
            out[v].append(round(time.perf_counter() - t0, 3))
            release_all_cache_slots()
    out = {k: sorted(v) for k, v in out.items()}
    out["sentinel_shuffle"] = round(
        min(bench._run_sentinel_shuffle(spark) for _ in range(3)), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
