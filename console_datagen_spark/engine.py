"""Engine facade: config → topology elaboration → streaming queries.

Mirrors the reference's startup lifecycle (SURVEY §3.1;
DataGenerator.java:136-193): resolve config, elaborate the topic/group
namespace, initialize the cluster (DDL), then start one producer query
per (group-type, group) and one counting consumer topology per type.

Where the reference fans out virtual threads per client, the engine
builds N StreamingQuery objects on one SparkSession — the cluster
scheduler replaces the thread pool. All methods that need a live broker
are cleanly separated from the pure-planning ones so the topology is
testable without Kafka.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .config import DataGenConfig, consumer_config, producer_config
from .naming import GROUP_TYPES, TopicSet, all_topic_names, group_id
from .sources.admin import TopicLifecycle, initialize_cluster, make_kafka_admin
from .sources.kafka_io import envelope, kafka_source
from .streaming.counters import count_records, counting_sink
from .streaming.generator_stream import kafka_writer, records_stream


@dataclass
class ProducerPlan:
    group_type: str
    group: int
    topics: list[str]
    compression: str


@dataclass
class ConsumerPlan:
    group_type: str
    group: int
    group_id: str
    topics: list[str]


@dataclass
class Topology:
    producers: list[ProducerPlan] = field(default_factory=list)
    consumers: list[ConsumerPlan] = field(default_factory=list)

    @property
    def all_topics(self) -> list[str]:
        seen: dict[str, None] = {}
        for p in self.producers:
            for t in p.topics:
                seen.setdefault(t)
        return list(seen)


class DataGenEngine:
    def __init__(
        self,
        spark: SparkSession,
        config: DataGenConfig | None = None,
        bootstrap_servers: str | None = None,
    ):
        self.spark = spark
        self.config = config or DataGenConfig()
        self.bootstrap_servers = bootstrap_servers

    # -- pure planning (no broker needed) --------------------------------
    def topology(self) -> Topology:
        """Elaborate the static client topology (DataGenerator.java:146-193)."""
        cfg = self.config
        counts = dict(
            zip(
                GROUP_TYPES,
                (
                    cfg.consumer_group_count,
                    cfg.share_group_count,
                    cfg.streams_group_count,
                ),
            )
        )
        topo = Topology()
        for gt in GROUP_TYPES:
            for g in range(counts[gt]):
                topics = TopicSet(
                    gt, g + 1, cfg.topics_per_member, cfg.topic_pattern
                ).names()[g * cfg.topics_per_member : (g + 1) * cfg.topics_per_member]
                topo.producers.append(
                    ProducerPlan(gt, g, topics, cfg.compression_for_group(g))
                )
                topo.consumers.append(
                    ConsumerPlan(gt, g, group_id(gt, g), topics)
                )
        return topo

    def topic_names(self) -> list[str]:
        cfg = self.config
        return all_topic_names(
            cfg.consumer_group_count,
            cfg.share_group_count,
            cfg.streams_group_count,
            cfg.topics_per_member,
            cfg.topic_pattern,
        )

    def producer_stream(self, plan: ProducerPlan) -> DataFrame:
        """The (unstarted) record stream for one producer plan."""
        return records_stream(
            self.spark, self.config, plan.group_type, plan.group
        )

    # -- broker-dependent ------------------------------------------------
    def initialize(self) -> dict | None:
        """DDL phase (S5-S9); returns None when no admin client lib exists."""
        if not self.bootstrap_servers:
            raise ValueError("bootstrap_servers required for initialize()")
        client = make_kafka_admin(self.bootstrap_servers)
        if client is None:
            return None
        lc = TopicLifecycle(client)
        return initialize_cluster(
            lc,
            self.topic_names(),
            self.config.partitions_per_topic,
            self.config.topic_replication_factor,
        )

    def start_producers(self, checkpoint_root: str) -> list:
        """One Kafka-sink StreamingQuery per producer plan (S1 + G9)."""
        queries = []
        for plan in self.topology().producers:
            cfg = producer_config(
                self.config.kafka.get("default")
                or _empty_cluster(),
            )
            writer = kafka_writer(
                self.producer_stream(plan),
                self.bootstrap_servers,
                client_config=cfg,
                compression_type=plan.compression,
                checkpoint_dir=(
                    f"{checkpoint_root}/producer-{plan.group_type}-{plan.group}"
                ),
            )
            queries.append(writer.start())
        return queries

    def start_counting_consumers(
        self, checkpoint_root: str, on_truncate=None
    ) -> list:
        """Consumer topologies: Kafka source → envelope → counters (A1+S8)."""
        queries = []
        for plan in self.topology().consumers:
            cfg = consumer_config(
                self.config.kafka.get("default") or _empty_cluster()
            )
            src = kafka_source(
                self.spark,
                self.bootstrap_servers,
                topics=plan.topics,
                client_config=cfg,
                group_id=plan.group_id,
            )
            counted = count_records(envelope(src), cluster="default")
            writer = (
                counting_sink(
                    envelope(src),
                    cluster="default",
                    on_truncate=on_truncate,
                    max_topic_depth=self.config.max_topic_depth,
                    query_name=f"counters-{plan.group_type}-{plan.group}",
                )
                .option(
                    "checkpointLocation",
                    f"{checkpoint_root}/consumer-{plan.group_type}-{plan.group}",
                )
            )
            queries.append((writer.start(), counted))
        return queries


def _empty_cluster():
    from .config import ClusterConfig

    return ClusterConfig("default", {})
