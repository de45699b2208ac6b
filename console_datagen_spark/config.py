"""Typed configuration tree + per-client config derivation (SURVEY §1.3).

Semantics mirrored from the reference (DataGenConfig.java:11-42,
ClientConfigFactory.java:61-135):

- nested config: datagen.{enabled, *_group_count, members_per_group,
  topics_per_member, partitions_per_topic, topic_replication_factor?,
  topic_pattern, max_topic_depth, compression_types[],
  kafka.<key>.{name, configs{}}}
- per-client maps are defaults ⊕ per-cluster overrides (override wins),
  then filtered to the client type's legal key set;
- ``group.id`` is banned for consumers (the generator assigns its own
  deterministic group ids — ClientConfigFactory.java:87-90);
- values are unquoted: a leading/trailing matching ' or " pair is
  stripped (ClientConfigFactory.java:133-135 regex strip).

In the Spark engine these dictionaries feed ``readStream/writeStream``
Kafka options (prefixed ``kafka.``) and the driver-side admin client.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .naming import DEFAULT_TOPIC_PATTERN

# Public Kafka client config names each client type accepts (subset of the
# published kafka-clients config surface that this engine forwards).
COMMON_KEYS = frozenset(
    {
        "bootstrap.servers",
        "client.id",
        "request.timeout.ms",
        "retries",
        "security.protocol",
        "ssl.truststore.certificates",
        "ssl.truststore.type",
        "ssl.endpoint.identification.algorithm",
        "sasl.mechanism",
        "sasl.jaas.config",
    }
)
ADMIN_KEYS = COMMON_KEYS | {"default.api.timeout.ms"}
PRODUCER_KEYS = COMMON_KEYS | {
    "acks",
    "batch.size",
    "linger.ms",
    "compression.type",
    "max.in.flight.requests.per.connection",
    "enable.idempotence",
    "key.serializer",
    "value.serializer",
}
CONSUMER_KEYS = COMMON_KEYS | {
    "group.id",
    "group.protocol",
    "auto.offset.reset",
    "enable.auto.commit",
    "max.poll.records",
    "fetch.max.bytes",
    "key.deserializer",
    "value.deserializer",
}
BANNED_CONSUMER_KEYS = frozenset({"group.id"})

_QUOTE_RE = re.compile(r"(^[\"'])|([\"']$)")


def unquote(value: str) -> str:
    """Strip one layer of leading/trailing single or double quotes."""
    return _QUOTE_RE.sub("", value)


@dataclass(frozen=True)
class ClusterConfig:
    name: str
    configs: dict[str, str] = field(default_factory=dict)


@dataclass(frozen=True)
class DataGenConfig:
    enabled: bool = True
    consumer_group_count: int = 1
    share_group_count: int = 1
    streams_group_count: int = 1
    members_per_group: int = 1
    topics_per_member: int = 1
    partitions_per_topic: int = 1
    topic_replication_factor: int | None = None
    topic_pattern: str = DEFAULT_TOPIC_PATTERN
    max_topic_depth: int = 5000
    compression_types: tuple[str, ...] = ("none",)
    kafka: dict[str, ClusterConfig] = field(default_factory=dict)

    def compression_for_group(self, group: int) -> str:
        """Producer g uses compression_types[g % len] (DataGenerator.java:364)."""
        return self.compression_types[group % len(self.compression_types)]


def merge_client_config(
    defaults: dict[str, str],
    overrides: dict[str, str],
    legal_keys: frozenset[str],
    banned_keys: frozenset[str] = frozenset(),
) -> dict[str, str]:
    """defaults ⊕ overrides → filter legal → drop banned → unquote values."""
    merged = {**defaults, **overrides}
    return {
        k: unquote(v)
        for k, v in merged.items()
        if k in legal_keys and k not in banned_keys and v is not None
    }


def admin_config(cluster: ClusterConfig, defaults: dict[str, str] | None = None) -> dict[str, str]:
    return merge_client_config(defaults or {}, cluster.configs, ADMIN_KEYS)


def producer_config(cluster: ClusterConfig, defaults: dict[str, str] | None = None) -> dict[str, str]:
    return merge_client_config(defaults or {}, cluster.configs, PRODUCER_KEYS)


def consumer_config(cluster: ClusterConfig, defaults: dict[str, str] | None = None) -> dict[str, str]:
    return merge_client_config(
        defaults or {}, cluster.configs, CONSUMER_KEYS, BANNED_CONSUMER_KEYS
    )


def kafka_stream_options(client_config: dict[str, str]) -> dict[str, str]:
    """Render a client config as Spark Kafka-source/sink options.

    Spark forwards options prefixed ``kafka.`` verbatim to the underlying
    client, which is exactly the reference's pass-through semantics.
    """
    return {f"kafka.{k}": v for k, v in client_config.items()}
