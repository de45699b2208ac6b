"""Persistent MinHash band index: partition-pruned incremental dedup.

``incremental_dedup`` (operators/dedup.py) rebuilds the corpus's band
frame per batch. At 100 TB you build the index ONCE and persist it
partitioned by a bucket of the band hash; a daily ingest batch then reads
only the buckets its own band hashes land in — Spark's partition pruning
turns the probe scan into O(batch-collisions), and the index itself is
codes-only (three BIGINTs per doc-band, no text), ~1000x smaller than the
corpus.

Layout: parquet partitioned by ``bucket = bh % n_buckets`` with columns
(doc_id, band, bh). Probing computes the batch's band hashes, collects
their O(n_buckets) distinct bucket list, prunes the index scan with a
static ``bucket IN (...)`` predicate (visible as PartitionFilters), and
verifies candidates with the exact-Jaccard kernel — fetching shingle ids
ONLY for the candidate corpus docs via a semi-join, so corpus text is
read point-wise, never scanned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .dedup import (
    doc_shingle_ids,
    flag_incoming_candidates,
    minhash_bands,
)

N_BUCKETS = 64


def build_minhash_index(
    documents: DataFrame,
    path: str,
    k: int = 8,
    rows_per_band: int = 2,
    n: int = 3,
    n_buckets: int = N_BUCKETS,
) -> None:
    """Persist the corpus's banded MinHash signatures, bucket-partitioned."""
    bands = minhash_bands(documents, k, rows_per_band, n)
    (
        bands.withColumn("bucket", F.pmod(F.col("bh"), F.lit(n_buckets)))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def probe_minhash_index(
    spark: SparkSession,
    path: str,
    corpus: DataFrame,
    incoming: DataFrame,
    k: int = 8,
    rows_per_band: int = 2,
    n: int = 3,
    threshold_permille: int = 350,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Flag an ingest batch against the persisted index — same result
    contract as ``incremental_dedup`` (doc_id, is_dup, match_id,
    match_permille), different read path: the corpus is touched only via
    (a) the pruned index partitions and (b) a semi-joined point fetch of
    candidate docs' text for the exact verify.

    ``k`` / ``rows_per_band`` / ``n`` / ``n_buckets`` must match the
    builder's values — they are layout parameters, same contract as the
    PQ geometry constants of the IVFPQ index.

    The bucket collect is O(n_buckets) rows — the same O(small) class as
    the IVF probe's cluster list — and it seeds a STATIC ``IN`` predicate
    so pruning happens at plan time, not runtime.
    """
    ids_i = doc_shingle_ids(incoming, n)
    bands_i = minhash_bands(incoming, k, rows_per_band, n, ids_df=ids_i)
    probe = bands_i.withColumn("bucket", F.pmod(F.col("bh"), F.lit(n_buckets)))
    buckets = sorted(r[0] for r in probe.select("bucket").distinct().collect())
    index = spark.read.parquet(path).where(F.col("bucket").isin(buckets))
    cand = (
        probe.select(F.col("doc_id").alias("doc_new"), "band", "bh", "bucket")
        .join(
            index.select(F.col("doc_id").alias("doc_old"), "band", "bh", "bucket"),
            ["bucket", "band", "bh"],
        )
        .select("doc_new", "doc_old")
        .distinct()
    )
    # point-fetch: shingle ids for candidate corpus docs ONLY
    cand_docs = cand.select(F.col("doc_old").alias("doc_id")).distinct()
    ids_c = doc_shingle_ids(corpus.join(cand_docs, "doc_id", "left_semi"), n)
    return flag_incoming_candidates(cand, ids_c, ids_i, incoming, threshold_permille)
