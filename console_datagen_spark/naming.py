"""Topic / group / client-id name generation (SURVEY §2.2 G10, §1.4).

Reproduces the reference's deterministic namespace exactly
(DataGenerator.java:197-210, 361, 382, 389):

- per type ∈ {consumer, share, streams}, group g, topic index t:
  suffix = base-36 of (t+10), lowercased → "a","b",...,"z","10",...
  name   = topic_pattern % (g, f"{type}-{suffix}")
- group id  = "console-datagen-group-%s-%d" % (type, g)
- client id = "console-datagen-{producer|consumer}-%s-%d-%d" % (type, g, n)
  where n is a single shared monotonically-increasing client counter
  (the reference's AtomicInteger clientCount, DataGenerator.java:361,389)
  — ``ClientCounter`` below reproduces it

Pure Python on the driver (namespace elaboration is config-time, not
data-path); SQL equivalents where a query needs them:
  Spark  : lower(conv(t + 10, 10, 36)), format_string(pattern, g, s)
  DuckDB : lower(to_base(t + 10, 36)),  printf(pattern, g, s)
"""

from __future__ import annotations

from dataclasses import dataclass

GROUP_TYPES = ("consumer", "share", "streams")
DEFAULT_TOPIC_PATTERN = "console_datagen_%03d-%s"
GROUP_ID_PATTERN = "console-datagen-group-%s-%d"
GROUP_ID_PREFIX = "console-datagen-group-"


def base36(n: int) -> str:
    """Lower-case base-36 rendering of a non-negative int."""
    if n < 0:
        raise ValueError("base36 expects non-negative input")
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"
    out = ""
    while True:
        n, r = divmod(n, 36)
        out = digits[r] + out
        if n == 0:
            return out


def topic_suffix(topic_index: int) -> str:
    """Suffix for the t-th topic of a member: base-36 of (t+10) → a,b,c,..."""
    return base36(topic_index + 10)


def topic_name(
    group: int,
    group_type: str,
    topic_index: int,
    pattern: str = DEFAULT_TOPIC_PATTERN,
) -> str:
    return pattern % (group, f"{group_type}-{topic_suffix(topic_index)}")


def group_id(group_type: str, group: int) -> str:
    return GROUP_ID_PATTERN % (group_type, group)


@dataclass
class ClientCounter:
    """Shared client counter — the reference's ``AtomicInteger clientCount``
    incremented by every producer AND consumer (DataGenerator.java:361,389).
    Single-threaded here: namespace elaboration happens on the driver."""

    count: int = 0

    def next(self) -> int:
        self.count += 1
        return self.count


def producer_client_id(group_type: str, group: int, client_count: int) -> str:
    """console-datagen-producer-%s-%d-%d (DataGenerator.java:361)."""
    return f"console-datagen-producer-{group_type}-{group}-{client_count}"


def consumer_client_id(group_type: str, group: int, client_count: int) -> str:
    """console-datagen-consumer-%s-%d-%d (DataGenerator.java:389); the last
    segment is the shared client counter, not the member index."""
    return f"console-datagen-consumer-{group_type}-{group}-{client_count}"


@dataclass(frozen=True)
class TopicSet:
    """The full topic namespace for one group type."""

    group_type: str
    groups: int
    topics_per_member: int
    pattern: str = DEFAULT_TOPIC_PATTERN

    def names(self) -> list[str]:
        return [
            topic_name(g, self.group_type, t, self.pattern)
            for g in range(self.groups)
            for t in range(self.topics_per_member)
        ]


def all_topic_names(
    consumer_groups: int,
    share_groups: int,
    streams_groups: int,
    topics_per_member: int,
    pattern: str = DEFAULT_TOPIC_PATTERN,
) -> list[str]:
    """Union of the three per-type namespaces (DataGenerator.java:150-153)."""
    counts = dict(
        zip(GROUP_TYPES, (consumer_groups, share_groups, streams_groups))
    )
    return [
        name
        for gt in GROUP_TYPES
        for name in TopicSet(gt, counts[gt], topics_per_member, pattern).names()
    ]
