"""Parallelism guard for CPU-heavy stages over small-file scans.

A parquet scan parallelizes by file split, not by compute: a 600 KB
single-row-group file is one task, so an explode/hash/shingle stage fed
by it runs single-threaded no matter how many cores the cluster has
(observed: the sf0.1 trigram explode pinned 1 of 32 cores; adding the
exchange cut the query 3.96 s -> 2.74 s). AQE cannot fix this — it sizes
partitions by BYTES, and coalesces a tiny-but-expensive stage right back
to one partition.

``spread`` inserts an explicit round-robin repartition ONLY when the
scan has fewer splits than the requested parallelism — at production
scale a 100 TB table has thousands of splits and this is a no-op; at
bench/test scale it unlocks the full core count for the expensive
downstream stage. The exchange moves the raw (pre-explode) rows, which
is the narrow end of these pipelines.

The probe is deliberately cheap: ``inputFiles()`` needs only the
analyzed plan. There is NO implicit ``df.rdd.getNumPartitions()``
fallback — that forces full physical planning on the driver per call,
and ``spread`` runs several times per composed query build. For frames
with no file sources the guard returns the frame untouched (a local
relation already parallelizes to ``defaultParallelism``); callers that
really need a plan-derived split count pass ``probe_plan=True``
explicitly, or supply ``n_splits`` themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(
    df: DataFrame,
    min_parallelism: int | None = None,
    n_splits: int | None = None,
    probe_plan: bool = False,
) -> DataFrame:
    """Repartition ``df`` up to ``min_parallelism`` (default: the
    session's ``sparkContext.defaultParallelism``) iff its split count
    is known to be lower; otherwise return it untouched.

    Split count resolution, cheapest first: the caller-supplied
    ``n_splits`` > ``inputFiles()`` on file-backed frames (analyzed
    plan only — the file count bounds the split count for the small
    files this guard targets) > ``df.rdd.getNumPartitions()`` ONLY when
    ``probe_plan=True`` (full physical planning; never the default) >
    no-op.
    """
    target = min_parallelism or df.sparkSession.sparkContext.defaultParallelism
    if n_splits is None:
        try:
            files = df.inputFiles()
        except Exception:  # non-SQL frames where the probe itself fails
            files = []
        if files:
            n_splits = len(files)
        elif probe_plan:
            n_splits = df.rdd.getNumPartitions()
        else:
            return df
    if n_splits >= target:
        return df
    return df.repartition(target)
