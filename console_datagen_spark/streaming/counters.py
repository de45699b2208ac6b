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

from collections.abc import Callable, Iterable

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
    The reference's listOffsets "latest" is the END offset (one past the
    last record), so the observed max RECORD offset maps to end = max+1:
    depth counts every resident record and ``truncate_before = end``
    deletes them all, exactly like delete_records(before=endOffset).
    """
    return (
        offsets.groupBy("topic", "partition")
        .agg(F.min("offset").alias("earliest"), F.max("offset").alias("latest"))
        .where(F.col("latest") + 1 - F.col("earliest") >= max_topic_depth)
        .select(
            "topic", "partition", (F.col("latest") + 1).alias("truncate_before")
        )
    )


class TruncationGate:
    """Cross-batch S8 depth tracking (DataGenerator.java:553-575).

    The reference asks the broker for earliest/latest offsets via
    listOffsets each check cycle, so its depth reflects the whole topic —
    not one poll's worth of records. A foreachBatch sink only sees the
    current micro-batch, so we carry the same frontier driver-side:
    per (topic, partition), ``earliest`` is the log-start offset (advanced
    by our own truncations, exactly as delete_records advances it
    broker-side) and ``latest`` is the max offset observed so far. State is
    one int pair per topic-partition — the same O(partitions) footprint as
    the reference's counter map.

    On restart the in-memory frontier is empty; pass ``broker_offsets``
    (the kafka-python ``consumer.beginning_offsets``-shaped callable:
    [(topic, partition)] -> {(topic, partition): log_start_offset}) to
    re-seed ``earliest`` from the broker instead of the first batch's min —
    otherwise depth accumulated before the restart is forgotten until the
    next natural crossing.
    """

    def __init__(
        self,
        max_topic_depth: int,
        broker_offsets: Callable[[list[tuple]], dict] | None = None,
    ):
        self.max_topic_depth = max_topic_depth
        self.broker_offsets = broker_offsets
        self._earliest: dict[tuple, int] = {}
        self._latest: dict[tuple, int] = {}

    def observe(self, batch_minmax: Iterable[dict]) -> list[dict]:
        """Fold one micro-batch's per-partition (earliest, latest) into the
        running frontier; return partitions whose cumulative depth crossed
        ``max_topic_depth`` (each fires once — earliest advances to the
        truncation point, so a partition only re-fires after another full
        depth's worth of new records)."""
        rows = list(batch_minmax)
        fresh = [
            (r["topic"], r["partition"])
            for r in rows
            if (r["topic"], r["partition"]) not in self._earliest
        ]
        if fresh and self.broker_offsets is not None:
            for key, log_start in self.broker_offsets(fresh).items():
                self._earliest[key] = log_start
        need: list[dict] = []
        for r in rows:
            key = (r["topic"], r["partition"])
            self._earliest.setdefault(key, r["earliest"])
            self._latest[key] = max(self._latest.get(key, r["latest"]), r["latest"])
            # listOffsets "latest" is the END offset (one past the newest
            # record), so the observed max record offset + 1 is the depth
            # numerator and the cut — delete_records(before=endOffset)
            # semantics, retaining nothing (DataGenerator.java:553-575)
            end = self._latest[key] + 1
            if end - self._earliest[key] >= self.max_topic_depth:
                need.append(
                    {
                        "topic": key[0],
                        "partition": key[1],
                        "truncate_before": end,
                    }
                )
                self._earliest[key] = end
        return need


def counting_sink(
    records: DataFrame,
    cluster: str,
    on_truncate: Callable[[list[dict]], None] | None = None,
    max_topic_depth: int = 5000,
    query_name: str = "counters",
    broker_offsets: Callable[[list[tuple]], dict] | None = None,
):
    """writeStream wrapper: maintain counters in an in-memory sink and fire
    the truncation callback from foreachBatch.

    Depth is cumulative across micro-batches via a driver-side
    ``TruncationGate`` (the reference's listOffsets loop,
    DataGenerator.java:553-575) — a topic whose depth grows by many small
    batches still trips the gate. The callback receives
    [{"topic","partition","truncate_before"}, ...] and is responsible for
    the idempotent AdminClient.delete_records call; batch replay safety
    comes from delete_records(before_offset) being naturally idempotent
    (replays re-delete an already-empty range).
    """
    state: dict[str, DataFrame] = {}
    gate = TruncationGate(max_topic_depth, broker_offsets=broker_offsets)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if on_truncate is not None and "offset" in batch_df.columns:
            batch_minmax = (
                batch_df.groupBy("topic", "partition")
                .agg(
                    F.min("offset").alias("earliest"),
                    F.max("offset").alias("latest"),
                )
                .collect()
            )
            need = gate.observe(r.asDict() for r in batch_minmax)
            if need:
                on_truncate(need)
        state["last_batch"] = batch_df

    return (
        records.writeStream.foreachBatch(handle_batch)
        .queryName(query_name)
        .outputMode("append")
    )
