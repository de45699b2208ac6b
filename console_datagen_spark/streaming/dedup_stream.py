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
