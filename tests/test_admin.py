"""Topic/group lifecycle semantics with a fake admin client (SURVEY §2.1 S5-S9)."""

import pytest

from console_datagen_spark.sources import admin as A


class UnknownTopicError(Exception):
    pass


class GroupNotEmptyError(Exception):
    pass


class FakeClient:
    def __init__(self, topics=(), groups=(), flaky_deletes=0):
        self.topics = set(topics)
        self.groups = dict(groups)  # gid -> state
        self.flaky_deletes = flaky_deletes  # fail this many delete calls first
        self.created = []
        self.deleted_records = []
        self.delete_calls = 0

    def describe_cluster(self):
        return {"cluster_id": "fake-cluster-1"}

    def create_topics(self, reqs):
        for r in reqs:
            name = r[0] if isinstance(r, tuple) else r.name
            self.created.append(r)
            self.topics.add(name)

    def delete_topics(self, names):
        for n in names:
            self.delete_calls += 1
            if n not in self.topics:
                raise UnknownTopicError(n)
            if self.flaky_deletes > 0:
                self.flaky_deletes -= 1
                raise RuntimeError("transient broker error")
            self.topics.discard(n)

    def list_consumer_groups(self, states=None):
        assert states == {"EMPTY"}, "state filter must be pushed server-side"
        return [(g, s) for g, s in self.groups.items() if s == "EMPTY"]

    def delete_consumer_groups(self, gids):
        for g in gids:
            if self.groups.get(g) == "NOT_EMPTY_RACE":
                raise GroupNotEmptyError(g)
            self.groups.pop(g, None)

    def delete_records(self, spec):
        self.deleted_records.append(spec)


@pytest.fixture()
def no_sleep():
    return lambda s: None


def test_create_topics_configs(no_sleep):
    c = FakeClient()
    lc = A.TopicLifecycle(c, sleep=no_sleep)
    created = lc.create_topics(["t1", "t2"], partitions=3)
    assert created == ["t1", "t2"]
    _, parts, _, configs = c.created[0]
    assert parts == 3
    assert configs["segment.bytes"] == str(10 * 1024 * 1024)
    assert configs["segment.ms"] == str(10 * 60 * 1000)


def test_delete_retry_until_empty(no_sleep):
    c = FakeClient(topics={"t1", "t2"}, flaky_deletes=3)
    lc = A.TopicLifecycle(c, sleep=no_sleep)
    remaining = lc.delete_topics_with_retry(["t1", "t2", "ghost"])
    assert remaining == set()  # ghost counts as success (unknown-topic)
    assert c.topics == set()
    assert c.delete_calls > 3  # retried past the transient failures


def test_delete_retry_gives_up_after_rounds(no_sleep):
    c = FakeClient(topics={"t1"}, flaky_deletes=10_000)
    lc = A.TopicLifecycle(c, sleep=no_sleep)
    remaining = lc.delete_topics_with_retry(["t1"])
    assert remaining == {"t1"}
    assert c.delete_calls == A.DELETE_RETRY_ROUNDS


def test_group_delete_prefix_and_state(no_sleep):
    c = FakeClient(
        groups={
            "console-datagen-group-consumer-0": "EMPTY",
            "console-datagen-group-share-0": "STABLE",  # not EMPTY → skipped
            "other-app-group": "EMPTY",  # wrong prefix → skipped
            "console-datagen-group-streams-0": "EMPTY",
        }
    )
    lc = A.TopicLifecycle(c, sleep=no_sleep)
    deleted = lc.delete_stale_groups()
    assert sorted(deleted) == [
        "console-datagen-group-consumer-0",
        "console-datagen-group-streams-0",
    ]
    assert "other-app-group" in c.groups


def test_group_delete_tolerates_races(no_sleep):
    c = FakeClient(groups={"console-datagen-group-consumer-1": "NOT_EMPTY_RACE"})
    c.list_consumer_groups = lambda states: [
        ("console-datagen-group-consumer-1", "EMPTY")
    ]
    lc = A.TopicLifecycle(c, sleep=no_sleep)
    assert lc.delete_stale_groups() == []  # swallowed, no raise


def test_truncate_passthrough(no_sleep):
    c = FakeClient()
    lc = A.TopicLifecycle(c, sleep=no_sleep)
    lc.truncate([{"topic": "t", "partition": 0, "truncate_before": 5900}])
    assert c.deleted_records == [{("t", 0): 5900}]


def test_initialize_sequence(no_sleep):
    c = FakeClient(
        topics={"console_datagen_000-consumer-a"},
        groups={"console-datagen-group-consumer-0": "EMPTY"},
    )
    lc = A.TopicLifecycle(c, sleep=no_sleep)
    out = A.initialize_cluster(
        lc, ["console_datagen_000-consumer-a"], partitions_per_topic=2
    )
    assert out["cluster_id"] == "fake-cluster-1"
    assert out["deleted_groups"] == ["console-datagen-group-consumer-0"]
    assert out["undeleted_topics"] == []
    assert out["created_topics"] == ["console_datagen_000-consumer-a"]


def test_make_admin_gated_without_lib():
    # kafka-python isn't installed in this container: factory returns None
    assert A.make_kafka_admin("localhost:9092") is None
