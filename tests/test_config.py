"""Config merge/filter semantics (SURVEY §1.3; ClientConfigFactory.java:61-135)."""

from console_datagen_spark import config as C


def test_unquote():
    assert C.unquote('"hello"') == "hello"
    assert C.unquote("'hello'") == "hello"
    assert C.unquote("plain") == "plain"
    # one layer only, mismatched quotes still stripped at each end
    assert C.unquote("\"x'") == "x"


def test_override_beats_default():
    out = C.merge_client_config(
        {"bootstrap.servers": "a:9092", "acks": "all"},
        {"bootstrap.servers": "b:9092"},
        C.PRODUCER_KEYS,
    )
    assert out["bootstrap.servers"] == "b:9092"
    assert out["acks"] == "all"


def test_illegal_keys_filtered():
    out = C.merge_client_config(
        {"bootstrap.servers": "a:9092", "not.a.kafka.key": "x"},
        {},
        C.PRODUCER_KEYS,
    )
    assert "not.a.kafka.key" not in out


def test_group_id_banned_for_consumers():
    cluster = C.ClusterConfig("c1", {"group.id": "rogue", "bootstrap.servers": "a"})
    out = C.consumer_config(cluster)
    assert "group.id" not in out
    assert out["bootstrap.servers"] == "a"
    # but group.id passes through merge when not banned
    assert "group.id" in C.merge_client_config({}, cluster.configs, C.CONSUMER_KEYS)


def test_values_unquoted_in_merge():
    out = C.merge_client_config(
        {}, {"bootstrap.servers": "'h:9092'"}, C.ADMIN_KEYS
    )
    assert out["bootstrap.servers"] == "h:9092"


def test_compression_round_robin():
    cfg = C.DataGenConfig(compression_types=("none", "gzip", "lz4"))
    assert [cfg.compression_for_group(g) for g in range(5)] == [
        "none", "gzip", "lz4", "none", "gzip",
    ]


def test_kafka_stream_options_prefix():
    assert C.kafka_stream_options({"acks": "1"}) == {"kafka.acks": "1"}
