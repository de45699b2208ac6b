"""Per-partition record counters + truncation gate (SURVEY §1.2, §2.1 S8).

The reference keeps ``Map<cluster, Map<TopicPartition, Long>>`` updated
per record (DataGenerator.java:119-127, 548-551) and, every 5000th record
on a partition, truncates the topic when depth ≥ max-topic-depth
(DataGenerator.java:541-545, 553-575).

Spark mapping:
- the counter table is an unbounded streaming aggregation
  groupBy(cluster, topic, partition).count() in update mode — partial
  (map-side) + final agg, state in the streaming state store;
- counter init for topics × partitions with 0 (DataGenerator.java:225-235)
  is a cross join of literal frames (A7);
- the truncation side-effect runs in ``foreachBatch``: compare per-
  partition offset depth, call AdminClient.delete_records. It must be
  idempotent across batch replays — gated on the recorded max offset.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

TRUNCATE_CHECK_EVERY = 5000  # DataGenerator.java:517, 541


def init_counters(
    spark: SparkSession,
    cluster: str,
    topics: list[str],
    partitions_per_topic: int,
) -> DataFrame:
    """Zero counters for the cluster's topics × partitions cross product."""
    t = spark.createDataFrame([(x,) for x in topics], "topic STRING")
    p = spark.range(partitions_per_topic).select(
        F.col("id").cast("int").alias("partition")
    )
    return t.crossJoin(p).select(
        F.lit(cluster).alias("cluster"),
        "topic",
        "partition",
        F.lit(0).cast("long").alias("count"),
    )


def count_records(envelopes: DataFrame, cluster: str = "default") -> DataFrame:
    """Keyed running count over (cluster, topic, partition) — A1.

    Works on both batch and streaming frames; streaming callers run it in
    update/complete output mode (state-store-backed).
    """
    return (
        envelopes.select(F.lit(cluster).alias("cluster"), "topic", "partition")
        .groupBy("cluster", "topic", "partition")
        .agg(F.count("*").alias("count"))
    )


def merge_counts(initial: DataFrame, observed: DataFrame) -> DataFrame:
    """initial (zeros) ⊕ observed counts → full counter table (left join
    keeps never-written partitions at 0, J3 semantics)."""
    obs = observed.select(
        "cluster", "topic", "partition", F.col("count").alias("observed")
    )
    return initial.join(obs, ["cluster", "topic", "partition"], "left").select(
        "cluster",
        "topic",
        "partition",
        (F.col("count") + F.coalesce(F.col("observed"), F.lit(0))).alias("count"),
    )


def partitions_needing_truncation(
    offsets: DataFrame, max_topic_depth: int
) -> DataFrame:
    """S8 predicate: per (topic, partition), latest − earliest ≥ depth.

    ``offsets`` has (topic, partition, offset) rows; the min/max pair
    replaces the reference's two OffsetSpec round-trips (J4 → single agg).
    """
    return (
        offsets.groupBy("topic", "partition")
        .agg(F.min("offset").alias("earliest"), F.max("offset").alias("latest"))
        .where(F.col("latest") - F.col("earliest") >= max_topic_depth)
        .select("topic", "partition", F.col("latest").alias("truncate_before"))
    )


def counting_sink(
    records: DataFrame,
    cluster: str,
    on_truncate: Callable[[list[dict]], None] | None = None,
    max_topic_depth: int = 5000,
    query_name: str = "counters",
):
    """writeStream wrapper: maintain counters in an in-memory sink and fire
    the truncation callback from foreachBatch.

    The callback receives [{"topic","partition","truncate_before"}, ...] and
    is responsible for the idempotent AdminClient.delete_records call; batch
    replay safety comes from delete_records(before_offset) being naturally
    idempotent (replays re-delete an already-empty range).
    """
    state: dict[str, DataFrame] = {}

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if on_truncate is not None and "offset" in batch_df.columns:
            need = partitions_needing_truncation(
                batch_df.select("topic", "partition", "offset"), max_topic_depth
            ).collect()
            if need:
                on_truncate([r.asDict() for r in need])
        state["last_batch"] = batch_df

    return (
        records.writeStream.foreachBatch(handle_batch)
        .queryName(query_name)
        .outputMode("append")
    )
