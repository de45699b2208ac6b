"""Event-time windowed aggregations (SURVEY §2.6, beyond-reference surface).

The reference is processing-time only (counts by arrival,
DataGenerator.java:537-546); this module adds the event-time surface:
tumbling / sliding / session windows with optional watermarking. Every
operator works on both batch and streaming frames — streaming parity is
asserted by comparing complete-mode output to the batch result over the
same rows (SURVEY §5.2.3), since a DuckDB oracle cannot run Structured
Streaming.

Scale notes: windowed aggs shuffle on (window, key); Spark's streaming
state store keeps one row per open (window, key); the watermark bounds
state growth — without it, 100 TB of history accumulates in state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def with_watermark(events: DataFrame, delay: str | None) -> DataFrame:
    """Watermark the event-time column iff the frame is streaming."""
    if delay and events.isStreaming:
        return events.withWatermark("ts", delay)
    return events


def tumbling_counts(
    events: DataFrame,
    duration: str = "1 hour",
    keys: tuple[str, ...] = ("event_type",),
    watermark: str | None = None,
) -> DataFrame:
    """Per-(window, keys) counts over non-overlapping windows (W3 analog)."""
    df = with_watermark(events, watermark)
    return (
        df.groupBy(F.window("ts", duration).alias("win"), *keys)
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("ws"),
            F.col("win.end").alias("we"),
            *keys,
            "n",
        )
    )


def sliding_counts(
    events: DataFrame,
    duration: str = "2 hours",
    slide: str = "1 hour",
    keys: tuple[str, ...] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping-window counts; each event lands in duration/slide windows."""
    df = with_watermark(events, watermark)
    return (
        df.groupBy(F.window("ts", duration, slide).alias("win"), *keys)
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("ws"), *keys, "n")
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    key: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Activity sessions: events within ``gap`` of each other merge (W2 analog
    of the reference's inactivity window, CounterProgressCheck.java:80-90).

    Returns (key, ss = first event ts of the session, n). The batch-SQL
    equivalent is the gaps-and-islands form (see plans/windows.py oracle).
    """
    df = with_watermark(events, watermark)
    return (
        df.groupBy(F.session_window("ts", gap).alias("win"), key)
        .agg(F.count("*").alias("n"), F.min("ts").alias("ss"))
        .select(key, "ss", "n")
    )


def rate_per_bucket(
    events: DataFrame, bucket_seconds: int = 10
) -> DataFrame:
    """Per-10s-bucket event counts — the observable used to assert the
    generator's 50 s sawtooth shape (BASELINE.md generator parity)."""
    bucket = F.timestamp_seconds(
        (F.unix_seconds(F.col("ts")) / bucket_seconds).cast("long")
        * bucket_seconds
    )
    return (
        events.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )
