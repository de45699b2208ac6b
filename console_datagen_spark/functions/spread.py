"""Parallelism guard for CPU-heavy stages over small-file scans.

A parquet scan parallelizes by file split, not by compute: a 600 KB
single-row-group file is one task, so an explode/hash/shingle stage fed
by it runs single-threaded no matter how many cores the cluster has
(observed: the sf0.1 trigram explode pinned 1 of 32 cores; adding the
exchange cut the query 3.96 s → 2.74 s). AQE cannot fix this — it sizes
partitions by BYTES, and coalesces a tiny-but-expensive stage right back
to one partition.

``spread`` inserts an explicit round-robin repartition ONLY when the
scan has fewer splits than the requested parallelism — at production
scale a 100 TB table has thousands of splits and this is a no-op; at
bench/test scale it unlocks the full core count for the expensive
downstream stage. The exchange moves the raw (pre-explode) rows, which
is the narrow end of these pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``min_parallelism`` (default: the
    session's ``sparkContext.defaultParallelism``) iff it currently has
    fewer partitions; otherwise return it untouched.

    Probe order: ``inputFiles()`` first — for the scan frames this guard
    targets, the file count bounds the split count and only needs the
    analyzed plan — falling back to ``df.rdd.getNumPartitions()`` (full
    physical planning, strictly heavier) for computed frames with no
    file sources.
    """
    target = min_parallelism or df.sparkSession.sparkContext.defaultParallelism
    try:
        n_parts = len(df.inputFiles()) or df.rdd.getNumPartitions()
    except Exception:  # non-file-backed plans (e.g. local relations)
        n_parts = df.rdd.getNumPartitions()
    if n_parts >= target:
        return df
    return df.repartition(target)
