"""On-disk curve-clustered layout with a min/max manifest — the real
data-skipping loop.

``layout_zorder`` / ``layout_hilbert_ab`` certify the layout *decision*
logically; this module makes it physical, the way a Delta/Iceberg
``OPTIMIZE ZORDER`` deployment works:

1. ``write_curve_layout``: bucket every row by the top bits of a
   space-filling-curve value (caller supplies the curve column — Morton
   via ``plans/layout._morton_sql`` or Hilbert via the unrolled fold),
   write parquet ``partitionBy(bucket)`` so each bucket is its own
   directory, and write a tiny **manifest** parquet next to it:
   per-bucket row count + min/max envelope of every clustered dimension.
   The manifest is the file-skipping metadata layer (what Delta keeps in
   the transaction log, Iceberg in manifest files).
2. ``pruned_read``: evaluate a conjunctive range predicate against the
   manifest (a driver-side read of B rows, B = bucket count), derive the
   surviving bucket list, and read ONLY those buckets — the ``bucket
   IN (...)`` filter lands in the scan's PartitionFilters, so pruned
   directories are never opened. min/max envelope semantics guarantee no
   false negatives (a bucket whose envelope misses the predicate cannot
   hold a matching row), so pruned-read == full-scan-filter exactly —
   asserted in tests/test_layout_store.py.

At 100 TB the manifest stays tiny (one row per bucket), the candidate
evaluation is O(buckets) on the driver (or a broadcast join if buckets
grow huge), and scan cost drops by the measured skipping factor of the
layout (7.6-7.9x for the bench predicate — see layout_hilbert_ab).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

MANIFEST_DIR = "_manifest"


def write_curve_layout(
    df: DataFrame,
    path: str,
    curve: Column,
    dims: list[str],
    n_buckets: int = 32,
    curve_bits: int = 32,
) -> None:
    """Cluster ``df`` into ``n_buckets`` directories by the top bits of
    ``curve`` and write the per-bucket min/max manifest over ``dims``.

    One pass for the data (partitionBy write), one cheap agg for the
    manifest. The bucket width is the CEIL division of the curve's
    2^curve_bits domain so the max curve value lands in bucket
    n_buckets-1 (floor width would spill it into an extra directory for
    non-power-of-two bucket counts), and the bucket id is exact integer
    arithmetic ((curve - curve % width) / width), never a float quotient.
    """
    domain = 1 << curve_bits
    width = -(-domain // n_buckets)
    clustered = df.withColumn(
        "bucket", ((curve - curve % F.lit(width)) / F.lit(width)).cast("long")
    )
    clustered.write.mode("overwrite").partitionBy("bucket").parquet(path)
    manifest = clustered.groupBy("bucket").agg(
        F.count("*").alias("n_rows"),
        *[
            agg
            for d in dims
            for agg in (F.min(d).alias(f"min_{d}"), F.max(d).alias(f"max_{d}"))
        ],
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}/{MANIFEST_DIR}")


def candidate_buckets(
    spark: SparkSession, path: str, ranges: dict[str, tuple[int, int]]
) -> list[int]:
    """Buckets whose min/max envelope intersects every (lo, hi) range.

    Driver-side: the manifest is one row per bucket. Envelope test =
    NOT (max < lo OR min > hi) per dimension; a surviving bucket MAY
    hold matches, a pruned one CANNOT (no false negatives).
    """
    m = spark.read.parquet(f"{path}/{MANIFEST_DIR}")
    cond = F.lit(True)
    for d, (lo, hi) in ranges.items():
        cond = cond & (F.col(f"max_{d}") >= lo) & (F.col(f"min_{d}") <= hi)
    return sorted(r.bucket for r in m.where(cond).select("bucket").collect())


def pruned_read(
    spark: SparkSession, path: str, ranges: dict[str, tuple[int, int]]
) -> DataFrame:
    """Read only manifest-surviving buckets, then apply the exact
    predicate. The ``bucket IN (...)`` filter prunes partition
    directories at plan time (PartitionFilters in the scan)."""
    cands = candidate_buckets(spark, path, ranges)
    df = spark.read.parquet(path).where(F.col("bucket").isin(cands))
    for d, (lo, hi) in ranges.items():
        df = df.where(F.col(d).between(lo, hi))
    return df
