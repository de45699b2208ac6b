"""Properties-tree parsing + TLS trust bootstrap (config ingestion)."""

import socket
import ssl
import subprocess
import threading

import pytest

from console_datagen_spark import config_io as CIO

PROPS = """
# reference-style application.properties
datagen.enabled=true
datagen.consumer-group-count=2
datagen.share-group-count=1
datagen.streams-group-count=1
datagen.members-per-group=3
datagen.topics-per-member=2
datagen.partitions-per-topic=4
datagen.topic-pattern=console_datagen_%03d-%s
datagen.max-topic-depth=5000
datagen.compression-types=none,gzip
datagen.kafka.c1.name=cluster-one
datagen.kafka.c1.configs.bootstrap.servers=broker1:9092
datagen.kafka.c1.configs.acks=all
datagen.kafka.c2.name=cluster-two
datagen.kafka.c2.configs.bootstrap.servers=broker2:9092
! trailing comment
"""


def test_from_properties_full_tree():
    cfg = CIO.from_properties(PROPS)
    assert cfg.enabled is True
    assert cfg.consumer_group_count == 2
    assert cfg.members_per_group == 3
    assert cfg.partitions_per_topic == 4
    assert cfg.compression_types == ("none", "gzip")
    assert cfg.topic_replication_factor is None
    assert set(cfg.kafka) == {"c1", "c2"}
    assert cfg.kafka["c1"].name == "cluster-one"
    assert cfg.kafka["c1"].configs["bootstrap.servers"] == "broker1:9092"
    assert cfg.kafka["c1"].configs["acks"] == "all"
    assert cfg.kafka["c2"].configs == {"bootstrap.servers": "broker2:9092"}


def test_from_properties_defaults():
    cfg = CIO.from_properties("datagen.enabled=true")
    assert cfg.consumer_group_count == 1
    assert cfg.compression_types == ("none",)
    assert cfg.topic_pattern == "console_datagen_%03d-%s"


@pytest.fixture()
def tls_server(tmp_path):
    """Self-signed TLS server on an ephemeral port."""
    key, crt = tmp_path / "k.pem", tmp_path / "c.pem"
    subprocess.run(
        [
            "openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
            "-keyout", str(key), "-out", str(crt), "-days", "1",
            "-subj", "/CN=localhost",
        ],
        check=True,
        capture_output=True,
    )
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(str(crt), str(key))
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(2)
    port = srv.getsockname()[1]
    stop = threading.Event()

    def serve():
        srv.settimeout(0.5)
        while not stop.is_set():
            try:
                conn, _ = srv.accept()
            except TimeoutError:
                continue
            except OSError:
                break
            try:
                with ctx.wrap_socket(conn, server_side=True):
                    pass
            except Exception:  # noqa: BLE001 handshake-only server
                pass

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    yield "127.0.0.1", port, crt.read_text()
    stop.set()
    srv.close()
    t.join(timeout=3)


def test_fetch_server_cert_and_inject(tls_server):
    host, port, expected_pem = tls_server
    pem = CIO.fetch_server_cert_pem(host, port)
    assert "BEGIN CERTIFICATE" in pem
    assert pem.strip() == expected_pem.strip()
    cfg = CIO.inject_truststore({"bootstrap.servers": f"{host}:{port}"}, pem)
    assert cfg["ssl.truststore.type"] == "PEM"
    assert cfg["security.protocol"] == "SSL"
    assert cfg["ssl.truststore.certificates"].startswith("-----BEGIN CERTIFICATE")
