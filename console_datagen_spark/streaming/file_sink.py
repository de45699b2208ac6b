"""Partitioned file sink for generated records (SURVEY §2.6 W4 analog).

The reference bounds Kafka storage with segment.bytes/segment.ms topic
configs (DataGenerator.java:323-347). The Spark-world analog for a
file-based deployment: a parquet sink partitioned by (topic, time bucket)
— each trigger closes out files inside the current bucket, giving the
same time-bounded segment layout, queryable by partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import DataStreamWriter


def segment_columns(records: DataFrame, bucket_seconds: int = 600) -> DataFrame:
    """Add (topic, seg_start) partition columns; bucket = W4's segment.ms."""
    seg = F.timestamp_seconds(
        (F.unix_seconds(F.current_timestamp()) / bucket_seconds).cast("long")
        * bucket_seconds
    )
    return records.withColumn(
        "seg_start", F.date_format(seg, "yyyy-MM-dd-HH-mm")
    )


def parquet_segment_writer(
    records: DataFrame,
    path: str,
    checkpoint_dir: str,
    trigger_seconds: int = 10,
) -> DataStreamWriter:
    """writeStream → parquet partitioned by (topic, seg_start)."""
    return (
        segment_columns(records)
        .writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("topic", "seg_start")
        .trigger(processingTime=f"{trigger_seconds} seconds")
    )


def idempotent_batch_writer(path: str):
    """Replay-safe foreachBatch parquet writer (exactly-once file sink).

    Structured Streaming guarantees at-least-once foreachBatch delivery:
    after a crash between sink write and checkpoint commit, the SAME
    batch_id is re-delivered. Appending would duplicate it; this writer
    stamps the batch id as a partition column and dynamically overwrites
    only that partition, so a replayed batch rewrites its own output
    in place — the standard exactly-once recipe for file sinks without a
    transaction log (Delta/Iceberg replace this with a commit protocol).
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(path)
        )

    return write_batch
