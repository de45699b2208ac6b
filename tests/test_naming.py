"""Name-generator golden tests (SURVEY §2.2 G10; DataGenerator.java:197-210)."""

from console_datagen_spark import naming


def test_base36():
    assert naming.base36(10) == "a"
    assert naming.base36(35) == "z"
    assert naming.base36(36) == "10"
    assert naming.base36(0) == "0"


def test_topic_suffix_sequence():
    # t=0 → base36(10) = 'a', then b, c, ...
    assert [naming.topic_suffix(t) for t in range(4)] == ["a", "b", "c", "d"]
    assert naming.topic_suffix(25) == "z"
    assert naming.topic_suffix(26) == "10"


def test_topic_name_default_pattern():
    assert naming.topic_name(0, "consumer", 0) == "console_datagen_000-consumer-a"
    assert naming.topic_name(7, "share", 1) == "console_datagen_007-share-b"
    assert naming.topic_name(12, "streams", 2) == "console_datagen_012-streams-c"


def test_group_and_client_ids():
    assert naming.group_id("consumer", 3) == "console-datagen-group-consumer-3"
    assert naming.group_id("streams", 0) == "console-datagen-group-streams-0"
    # client ids carry the shared monotone counter as the last segment,
    # matching the reference's AtomicInteger (DataGenerator.java:361,389)
    ctr = naming.ClientCounter()
    assert (
        naming.producer_client_id("share", 2, ctr.next())
        == "console-datagen-producer-share-2-1"
    )
    assert (
        naming.consumer_client_id("consumer", 1, ctr.next())
        == "console-datagen-consumer-consumer-1-2"
    )
    assert ctr.count == 2


def test_all_topic_names_default_config():
    # defaults: 1 group per type, 1 topic per member → 3 topics
    names = naming.all_topic_names(1, 1, 1, 1)
    assert names == [
        "console_datagen_000-consumer-a",
        "console_datagen_000-share-a",
        "console_datagen_000-streams-a",
    ]


def test_all_topic_names_order_and_count():
    names = naming.all_topic_names(2, 1, 1, 2)
    assert len(names) == (2 + 1 + 1) * 2
    assert names[0] == "console_datagen_000-consumer-a"
    assert names[1] == "console_datagen_000-consumer-b"
    assert names[2] == "console_datagen_001-consumer-a"
