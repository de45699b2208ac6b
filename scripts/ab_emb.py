"""Interleaved A/B of _emb_dups hold policy (dedup_embedding pipeline).

Variants: cur (normed eager + buckets lazy + cand eager — the r14
committed policy), nocand (cand NOT held), none (nothing held), and the
r15 additions: nlazy (normed LAZY — lsh_buckets_multi's plane collect is
the job that fills the cache, deleting the separate count job), nlazy_cl
(normed lazy + cand lazy), nlazy_nc (normed lazy + cand unheld).
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
from console_datagen_spark.operators import similarity as S
from console_datagen_spark.plans.similarity import _DUP_BANDS, EMB
from console_datagen_spark.session import get_spark

SF = bench.SF_DIR
_slot = CacheSlot()


def build(spark, mode):
    _slot.release()
    emb = register_views(spark, SF, EMB)["embeddings"]
    normed = S.with_norm(emb)
    if mode in ("cur", "nocand"):
        normed = _slot.hold(normed)
    elif mode.startswith("nlazy"):
        normed = _slot.hold(normed, materialize=False)
    buckets = S.lsh_buckets_multi(emb, _DUP_BANDS, normed=normed)
    if mode != "none":
        buckets = _slot.hold(buckets, materialize=False)
    cand = S.candidate_pairs_from_buckets(buckets)
    if mode in ("cur", "nlazy"):
        cand = _slot.hold(cand)
    elif mode == "nlazy_cl":
        cand = _slot.hold(cand, materialize=False)
    return S.embedding_dup_pairs_lsh(
        emb, bands=_DUP_BANDS, threshold=0.4, candidates=cand, normed=normed
    ).orderBy("vec_a", "vec_b")


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="ab-emb", extra_conf={"spark.driver.memory": "8g"})
    register_views(spark, SF, EMB)["embeddings"].count()
    out = {
        m: []
        for m in ("cur", "nocand", "none", "nlazy", "nlazy_cl", "nlazy_nc")
    }
    for _ in range(runs):
        for m in out:
            t0 = time.perf_counter()
            build(spark, m).write.format("noop").mode("overwrite").save()
            out[m].append(round(time.perf_counter() - t0, 3))
            release_all_cache_slots()
    out = {k: sorted(v) for k, v in out.items()}
    out["sentinel_shuffle"] = round(
        min(bench._run_sentinel_shuffle(spark) for _ in range(3)), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
