"""Kafka topic/group lifecycle (SURVEY §2.1 S5-S9) — driver-side DDL.

Spark has no topic-admin API, so this stays a plain-Python driver utility
mirroring the reference's initialize() sequence (DataGenerator.java:237-348):
probe cluster → delete stale groups → delete topics with retry → create
topics. The kafka client library is optional (not in the test container);
all logic is written against an injected client object exposing the
kafka-python AdminClient surface, so retry/filtering semantics are fully
unit-testable with a fake.

Semantics mirrored:
- S5 create: NewTopic(partitions, rf) + segment.bytes=10MiB, segment.ms=10min,
  then settle pause (DataGenerator.java:323-347);
- S6 delete w/ retry: ignore unknown-topic, retry ≤10 rounds with 5 s pause
  until none remain (DataGenerator.java:296-321) — the remaining set is the
  E1 set-difference frontier;
- S7 group delete: only states EMPTY, only the console-datagen- prefix
  (P2/P3 predicates), tolerate not-empty/not-found (DataGenerator.java:248-294);
- S8 truncate: delete records before the current offset when depth ≥ max
  (DataGenerator.java:553-575) — invoked from the counting sink's
  foreachBatch callback (streaming/counters.py);
- S9 probe: describe_cluster for init + liveness (AdminConnectivityCheck.java:32-43).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable

from ..naming import GROUP_ID_PREFIX

SEGMENT_BYTES = 10 * 1024 * 1024  # DataGenerator.java:326
SEGMENT_MS = 10 * 60 * 1000  # DataGenerator.java:328
DELETE_RETRY_ROUNDS = 10  # DataGenerator.java:307
SETTLE_SECONDS = 5  # DataGenerator.java:319-321, 345


def make_kafka_admin(bootstrap_servers: str, client_config: dict | None = None):
    """Build a real kafka-python AdminClient; None if the lib is absent."""
    try:
        from kafka.admin import KafkaAdminClient  # type: ignore
    except ImportError:
        return None
    return KafkaAdminClient(
        bootstrap_servers=bootstrap_servers, **(client_config or {})
    )


class TopicLifecycle:
    """S5-S9 over any client exposing the kafka-python admin surface."""

    def __init__(self, client, sleep: Callable[[float], None] = time.sleep):
        self.client = client
        self.sleep = sleep

    # -- S9 --------------------------------------------------------------
    def cluster_id(self) -> str | None:
        info = self.client.describe_cluster()
        return info.get("cluster_id") if isinstance(info, dict) else None

    # -- S5 --------------------------------------------------------------
    def create_topics(
        self,
        names: Iterable[str],
        partitions: int,
        replication_factor: int | None = None,
        settle: bool = True,
    ) -> list[str]:
        try:
            from kafka.admin import NewTopic  # type: ignore
        except ImportError:  # test path: fake clients accept plain tuples
            NewTopic = None
        configs = {
            "segment.bytes": str(SEGMENT_BYTES),
            "segment.ms": str(SEGMENT_MS),
        }
        reqs = [
            NewTopic(
                name=n,
                num_partitions=partitions,
                replication_factor=replication_factor or -1,
                topic_configs=configs,
            )
            if NewTopic
            else (n, partitions, replication_factor, configs)
            for n in names
        ]
        self.client.create_topics(reqs)
        if settle:
            self.sleep(SETTLE_SECONDS)
        return [r.name if hasattr(r, "name") else r[0] for r in reqs]

    # -- S6 --------------------------------------------------------------
    def delete_topics_with_retry(
        self, names: Iterable[str], max_rounds: int = DELETE_RETRY_ROUNDS
    ) -> set[str]:
        """Delete until none remain; returns any topics still undeleted.

        The frontier is requested − successfully-deleted (E1 semantics);
        unknown-topic errors count as success.
        """
        remaining = set(names)
        for _ in range(max_rounds):
            if not remaining:
                break
            failed: set[str] = set()
            for name in sorted(remaining):
                try:
                    self.client.delete_topics([name])
                except Exception as exc:  # noqa: BLE001
                    if not _is_unknown_topic(exc):
                        failed.add(name)
            remaining = failed
            if remaining:
                self.sleep(SETTLE_SECONDS)
        return remaining

    # -- S7 --------------------------------------------------------------
    def delete_stale_groups(self) -> list[str]:
        """Delete EMPTY console-datagen groups; tolerate races.

        P3 (state filter) is pushed server-side when the client supports
        it, P2 (prefix) applied here; deletion errors for now-nonempty or
        already-gone groups are swallowed (DataGenerator.java:282-292).
        """
        groups = self.client.list_consumer_groups(states={"EMPTY"})
        target = [
            g[0] if isinstance(g, tuple) else g
            for g in groups
        ]
        target = [g for g in target if g.startswith(GROUP_ID_PREFIX)]
        deleted = []
        for gid in target:
            try:
                self.client.delete_consumer_groups([gid])
                deleted.append(gid)
            except Exception as exc:  # noqa: BLE001
                if not _is_tolerable_group_error(exc):
                    raise
        return deleted

    # -- S8 --------------------------------------------------------------
    def truncate(self, requests: list[dict]) -> None:
        """delete_records before the recorded offset, per partition.

        ``requests`` come from streaming/counters.py:
        [{"topic", "partition", "truncate_before"}, ...]. Naturally
        idempotent: replaying a batch re-deletes an already-empty range.
        """
        for r in requests:
            self.client.delete_records(
                {(r["topic"], r["partition"]): r["truncate_before"]}
            )


def _is_unknown_topic(exc: Exception) -> bool:
    return "unknown" in type(exc).__name__.lower() or "Unknown" in str(exc)


def _is_tolerable_group_error(exc: Exception) -> bool:
    s = (type(exc).__name__ + str(exc)).lower()
    return "notempty" in s or "not empty" in s or "notfound" in s or "not found" in s


def initialize_cluster(
    lifecycle: TopicLifecycle,
    topic_names: list[str],
    partitions_per_topic: int,
    replication_factor: int | None = None,
) -> dict:
    """The reference's full init sequence (DataGenerator.java:237-348)."""
    cluster = lifecycle.cluster_id()
    stale = lifecycle.delete_stale_groups()
    undeleted = lifecycle.delete_topics_with_retry(topic_names)
    created = lifecycle.create_topics(
        topic_names, partitions_per_topic, replication_factor
    )
    return {
        "cluster_id": cluster,
        "deleted_groups": stale,
        "undeleted_topics": sorted(undeleted),
        "created_topics": created,
    }
