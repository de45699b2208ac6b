"""Output compaction: size-aware repartitioning for writes.

Small-file explosion is the classic failure of large pipelines: a 1000-
task stage writing a partitioned table emits 1000 tiny files per
partition, and downstream scans drown in open() overhead. Compaction
estimates the frame's serialized size and coalesces/repartitions so each
output file lands near ``target_mb``.

Estimation: sample-based average row width × row count (cheap, bounded
error); for parquet the on-disk size is further reduced by encoding, so
``compression_ratio`` defaults conservative. A real deployment would read
sizes from the previous write's metrics instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def estimate_bytes(df: DataFrame, sample_rows: int = 1000) -> int:
    """Approximate in-memory bytes from a bounded sample."""
    n = df.count()
    if n == 0:
        return 0
    sample = df.limit(sample_rows)
    # serialized JSON length is a stable, schema-agnostic width proxy
    width = (
        sample.select(
            F.avg(F.length(F.to_json(F.struct(*df.columns)))).alias("w")
        ).first()["w"]
        or 0
    )
    return int(n * width)


def compact_for_write(
    df: DataFrame,
    target_mb: int = 128,
    compression_ratio: float = 0.3,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Repartition so each output file ends up near target_mb on disk."""
    est = estimate_bytes(df) * compression_ratio
    n_files = max(1, int(est // (target_mb * 1024 * 1024)) + 1)
    if partition_cols:
        # spread within each output partition value
        return df.repartition(n_files, *partition_cols)
    return df.repartition(n_files)
