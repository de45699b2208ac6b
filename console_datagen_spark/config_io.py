"""Config ingestion: properties-file parsing + TLS trust bootstrap.

Mirrors the reference's two config entry behaviors:

- ``from_properties``: the ``datagen.*`` property tree (DataGenConfig.java
  @ConfigMapping, application.properties:7-16) parsed into the typed
  ``DataGenConfig``, including per-cluster ``datagen.kafka.<key>.name`` /
  ``datagen.kafka.<key>.configs.<prop>`` nesting.
- ``fetch_server_cert_pem``: the trust-all bootstrap that pulls the
  broker's certificate chain over a raw TLS socket and injects it as a
  PEM truststore (ClientConfigFactory.java:145-184) — so a cluster with a
  private CA can be reached without pre-provisioned trust stores.
"""

from __future__ import annotations

import ssl

from .config import ClusterConfig, DataGenConfig

_PREFIX = "datagen."


def parse_properties(text: str) -> dict[str, str]:
    """Minimal .properties parser: k=v lines, #/! comments, trimmed."""
    out: dict[str, str] = {}
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith(("#", "!")):
            continue
        if "=" not in line:
            continue
        k, _, v = line.partition("=")
        out[k.strip()] = v.strip()
    return out


def _to_bool(v: str) -> bool:
    return v.strip().lower() in ("true", "1", "yes")


def from_properties(props: dict[str, str] | str) -> DataGenConfig:
    """Build a DataGenConfig from a properties dict or file text."""
    if isinstance(props, str):
        props = parse_properties(props)
    d = {
        k[len(_PREFIX):]: v for k, v in props.items() if k.startswith(_PREFIX)
    }

    def geti(key: str, default: int) -> int:
        return int(d.get(key, default))

    clusters: dict[str, dict] = {}
    for k, v in d.items():
        if not k.startswith("kafka."):
            continue
        rest = k[len("kafka."):]
        ckey, _, attr = rest.partition(".")
        c = clusters.setdefault(ckey, {"name": ckey, "configs": {}})
        if attr == "name":
            c["name"] = v
        elif attr.startswith("configs."):
            c["configs"][attr[len("configs."):]] = v

    compression = tuple(
        s.strip() for s in d.get("compression-types", "none").split(",") if s.strip()
    ) or ("none",)

    trf = d.get("topic-replication-factor")
    return DataGenConfig(
        enabled=_to_bool(d.get("enabled", "true")),
        consumer_group_count=geti("consumer-group-count", 1),
        share_group_count=geti("share-group-count", 1),
        streams_group_count=geti("streams-group-count", 1),
        members_per_group=geti("members-per-group", 1),
        topics_per_member=geti("topics-per-member", 1),
        partitions_per_topic=geti("partitions-per-topic", 1),
        topic_replication_factor=int(trf) if trf is not None else None,
        topic_pattern=d.get("topic-pattern", DataGenConfig.topic_pattern),
        max_topic_depth=geti("max-topic-depth", 5000),
        compression_types=compression,
        kafka={
            k: ClusterConfig(name=c["name"], configs=c["configs"])
            for k, c in clusters.items()
        },
    )


def fetch_server_cert_pem(host: str, port: int, timeout: float = 10.0) -> str:
    """Fetch the server's certificate chain as PEM over an unverified TLS
    handshake (trust-all bootstrap; the PEM then becomes the truststore).

    The reference injects the FULL peer chain including the CA
    (ClientConfigFactory.java:145-184). On Python 3.13+ this does the same
    via ``SSLSocket.get_unverified_chain``; on older runtimes it falls back
    to the leaf certificate only — a documented limitation: with per-broker
    certs from a private CA, a leaf-only truststore validates just the
    bootstrap broker, and connections to the other brokers fail TLS
    verification until the CA cert is added.
    """
    import socket

    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    ctx.check_hostname = False
    ctx.verify_mode = ssl.CERT_NONE
    with socket.create_connection((host, port), timeout=timeout) as sock:
        with ctx.wrap_socket(sock, server_hostname=host) as ssock:
            get_chain = getattr(ssock, "get_unverified_chain", None)
            if get_chain is not None:  # Python 3.13+
                try:
                    blocks = [c.public_bytes() for c in get_chain() or []]
                    if blocks:
                        return "".join(blocks)
                except (ssl.SSLError, TypeError):
                    pass  # fall through to leaf-only
            der = ssock.getpeercert(binary_form=True)
    return ssl.DER_cert_to_PEM_cert(der)


def inject_truststore(client_config: dict[str, str], pem: str) -> dict[str, str]:
    """Return the config with the PEM truststore wired in (CCF:166-179)."""
    return {
        **client_config,
        "security.protocol": client_config.get("security.protocol", "SSL"),
        "ssl.truststore.type": "PEM",
        "ssl.truststore.certificates": pem,
    }
