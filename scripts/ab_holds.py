"""Interleaved same-session A/B of CacheSlot hold policies under the r14
packed-array verify.

Families:
  mh_hold / mh_nohold       — dedup_minhash_pairs (full registered query,
                              ORDER BY included) with/without the eager
                              ids hold
  pf_both / pf_prefix / pf_none
                            — dedup_prefix_filter_pairs with ids+prefix
                              held, only prefix held, or nothing held
Prints sorted samples per variant + a min-of-3 shuffle sentinel.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from console_datagen_spark.caching import CacheSlot, release_all_cache_slots
from console_datagen_spark.catalog import register_views
from console_datagen_spark.operators import dedup as D
from console_datagen_spark.plans.dedup import (
    _JACCARD_PERMILLE,
    _K,
    _ROWS_PER_BAND,
    DOCS,
)
from console_datagen_spark.session import get_spark

SF = bench.SF_DIR
_slot = CacheSlot()


def mh(spark, hold):
    _slot.release()
    docs = register_views(spark, SF, DOCS)["documents"]
    ids = D.doc_shingle_ids(docs)
    if hold:
        ids = _slot.hold(ids)
    cand = D.lsh_candidate_pairs(
        docs, k=_K, rows_per_band=_ROWS_PER_BAND, ids_df=ids
    )
    return D.ngram_jaccard_pairs(
        docs, threshold_permille=_JACCARD_PERMILLE, candidates=cand, ids_df=ids
    ).orderBy("doc_a", "doc_b")


def pf(spark, mode):
    _slot.release()
    docs = register_views(spark, SF, DOCS)["documents"]
    ids = D.doc_shingle_ids(docs)
    if mode == "both":
        ids = _slot.hold(ids)
    prefix = D.prefix_tokens(docs, threshold_permille=_JACCARD_PERMILLE, ids_df=ids)
    if mode in ("both", "prefix"):
        prefix = _slot.hold(prefix)
    cand = D.prefix_filter_candidates(
        docs, threshold_permille=_JACCARD_PERMILLE, ids_df=ids, prefix_df=prefix
    )
    return D.ngram_jaccard_pairs(
        docs, threshold_permille=_JACCARD_PERMILLE, candidates=cand, ids_df=ids
    ).orderBy("doc_a", "doc_b")


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="ab-holds",
                      extra_conf={"spark.driver.memory": "8g"})
    register_views(spark, SF, DOCS)["documents"].count()
    variants = {
        "mh_hold": lambda: mh(spark, True),
        "mh_nohold": lambda: mh(spark, False),
        "pf_both": lambda: pf(spark, "both"),
        "pf_prefix": lambda: pf(spark, "prefix"),
        "pf_none": lambda: pf(spark, "none"),
    }
    out = {k: [] for k in variants}
    for _ in range(runs):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            out[k].append(round(time.perf_counter() - t0, 3))
            release_all_cache_slots()
    out = {k: sorted(v) for k, v in out.items()}
    out["sentinel_shuffle"] = round(
        min(bench._run_sentinel_shuffle(spark) for _ in range(3)), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
