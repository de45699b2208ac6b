"""Shuffle-partition invariance: the certified surface must not depend
on spark.sql.shuffle.partitions.

The DuckDB oracle proves each query deterministic under ONE Spark
config; this spot-check proves the other axis — the same query at 3 vs
32 shuffle partitions must produce identical canonical results. Covers
the risk classes: float-adjacent arithmetic (PQ/cosine), window
tie-breaks, sampling/salting, sketch roll-ups, streaming-compaction
twins.
"""

from __future__ import annotations

import pytest

from console_datagen_spark.plans import all_queries
from tests.test_oracle import strict_canon

SAMPLE = [
    "dedup_minhash_pairs",
    "dedup_lsh_capped",
    "agg_kmv_setops",
    "agg_salted_sum",
    "sample_split",
    "sim_pq_topk",
    "win_session_30m",
    "agg_quantiles",
    "cdc_latest_state",
    "text_trigram_backoff_lm",
    # r14: the new window-fold and multi-level-agg shapes (the Merkle
    # ordered folds and the compaction running total are exactly the
    # tie-break/ordering risk class this file exists for)
    "datasheet_merkle_root",
    "layout_compaction_plan",
    "mm_audio_flac_stereo",
    # r14 session 2: the epoch permutation's window tie-break is the
    # canonical ordering risk; the two new codec paths ride mapInPandas
    # over repartitioned inputs, so partition count must not leak
    "pipeline_epoch_shuffle",
    "mm_audio_adpcm",
    "mm_image_gif",
    # r14 session 2c: shard grouping (applyInPandas) and multi-frame
    # explode shapes must not leak partition count either
    "io_tar_shards_roundtrip",
    "mm_video_gif_anim",
]


@pytest.mark.parametrize("name", SAMPLE)
def test_result_invariant_to_shuffle_partitions(spark, sf_dir, name):
    q = all_queries()[name]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        few = strict_canon(q.spark(spark, sf_dir).toPandas())
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        many = strict_canon(q.spark(spark, sf_dir).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert few.equals(many), name
