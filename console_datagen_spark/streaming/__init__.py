"""Structured Streaming surface: generator stream, counters, windows, health."""

from .counters import (  # noqa: F401
    count_records,
    counting_sink,
    init_counters,
    merge_counts,
    partitions_needing_truncation,
)
from .cdc import (  # noqa: F401
    CdcLiveView,
    cdc_compact,
    latest_wins,
    latest_wins_ttl_jvm,
)
from .dedup_stream import exact_dedup_stream, fingerprint_dedup_stream  # noqa: F401
from .enrich import enrich_stream, filter_known_duplicates  # noqa: F401
from .generator_stream import (  # noqa: F401
    kafka_writer,
    rate_stream,
    records_stream,
    sawtooth_thin,
)
from .health import activity_from_snapshots, health_summary, staleness_tier  # noqa: F401
from .listener import install_health_listener  # noqa: F401
from .stateful import stateful_counts  # noqa: F401
from .windows import (  # noqa: F401
    rate_per_bucket,
    session_counts,
    sliding_counts,
    tumbling_counts,
)
