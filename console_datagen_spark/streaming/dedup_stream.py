"""Streaming deduplication (north-star dedup, streaming tier).

Batch dedup (operators/dedup.py) covers the corpus case; streams need
dedup *as data arrives*. Two built-in tiers:

- ``exact_dedup_stream``: dropDuplicatesWithinWatermark on a content key —
  state holds one row per key only until the watermark passes, so state is
  bounded (without the watermark variant, 100 TB of keys accumulate).
- ``fingerprint_dedup_stream``: same, keyed on a computed content hash
  (md5 of the payload), for when the natural key is the content itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def exact_dedup_stream(
    stream: DataFrame,
    keys: list[str],
    event_time_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival per key within the watermark horizon."""
    return stream.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def fingerprint_dedup_stream(
    stream: DataFrame,
    content_col: str,
    event_time_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Content-hash streaming dedup (md5 key, computed JVM-side)."""
    withfp = stream.withColumn("_fp", F.md5(F.col(content_col)))
    return (
        withfp.withWatermark(event_time_col, watermark)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp")
    )


def index_probe_dedup_stream(
    stream: DataFrame,
    index_path: str,
    corpus_path: str,
    checkpoint_path: str,
    threshold_permille: int = 350,
    n_buckets: int = 64,
):
    """Streaming near-dup ingest against a SELF-MAINTAINING persisted index.

    The full crawl-ingest loop as one streaming query: each micro-batch is
    (1) exact-deduped within itself (md5, min doc_id wins), (2) probed
    against the persisted MinHash band index (partition-pruned — see
    operators/dedup_index.probe_minhash_index), (3) survivors land in the
    corpus store AND their band signatures in the index, so a doc in
    batch N+1 duplicating a batch-N doc is caught. State lives entirely
    in the two parquet stores — the streaming query itself is stateless —
    and both stores are batch-partitioned with dynamic overwrite, so a
    replayed micro-batch REPLACES its own partition: recovery after a
    crash between the writes and the checkpoint commit is idempotent,
    not merely at-least-once.

    Returns the StreamingQuery. ``stream`` must carry (doc_id, text, ts).
    """
    import os

    from pyspark.sql import functions as F

    from ..operators.dedup import doc_shingle_ids, minhash_bands
    from ..operators.dedup_index import probe_minhash_index

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        # (1) within-batch exact dedup — keep the lowest doc_id per text
        w_first = (
            batch.groupBy(F.md5("text").alias("_h"))
            .agg(F.min("doc_id").alias("doc_id"))
            .drop("_h")
        )
        batch = batch.join(w_first, "doc_id", "left_semi")
        # (2) cross-batch probe of the persisted index
        if os.path.exists(index_path):
            corpus = spark.read.parquet(corpus_path)
            flags = probe_minhash_index(
                spark,
                index_path,
                corpus,
                batch,
                threshold_permille=threshold_permille,
                n_buckets=n_buckets,
            )
            keep_ids = flags.where(F.col("is_dup") == 0).select("doc_id")
            kept = batch.join(keep_ids, "doc_id", "left_semi")
        else:
            kept = batch
        # (3) write survivors to the corpus store and the band index.
        # Idempotent retries: both stores are partitioned by _batch and
        # written with DYNAMIC partition overwrite, so a replayed batch
        # (foreachBatch's at-least-once contract) REPLACES its own
        # partition instead of appending duplicates — the standard
        # batch-id idempotence recipe for foreachBatch sinks.
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        kept = kept.withColumn("_batch", F.lit(batch_id))
        kept.persist()
        try:
            # Cluster each batch's writes so the stores grow by a BOUNDED
            # file count per round: without this, every one of W write
            # tasks emits a file into every partition dir it sees (W
            # files/batch in the corpus, up to W x n_buckets in the
            # index), and after a few hundred micro-batches the listing +
            # parquet-footer overhead of hundreds of thousands of tiny
            # files dominates every probe (the streaming soak OOMed at
            # ~round 70 before this). One file per batch / per (bucket,
            # batch) is right at ingest granularity; a deployment sizing
            # multi-GB batches would repartition by target file size
            # instead — the invariant to keep is files-per-batch bounded,
            # not writers x partitions.
            (
                kept.repartition(1)
                .write.mode("overwrite")
                .partitionBy("_batch")
                .parquet(corpus_path)
            )
            bands = minhash_bands(kept, ids_df=doc_shingle_ids(kept))
            (
                bands.withColumn("bucket", F.pmod(F.col("bh"), F.lit(n_buckets)))
                .withColumn("_batch", F.lit(batch_id))
                .repartition(F.col("bucket"))
                .write.mode("overwrite")
                .partitionBy("bucket", "_batch")
                .parquet(index_path)
            )
        finally:
            kept.unpersist()

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
