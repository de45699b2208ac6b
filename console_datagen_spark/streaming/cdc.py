"""Latest-record-wins (CDC/changelog) compaction — one definition, both
execution modes.

The reference's counter map IS a latest-wins view: every record overwrites
the previous value for its (cluster, topic, partition) key
(DataGenerator.java:548-551). The batch analog is the registered
``cdc_latest_state`` query (plans/sequences.py); this module expresses the
same semantics as a streaming aggregation so ONE logical definition runs
over a bounded frame (batch) or an unbounded stream (update/complete
mode), and the parity test certifies they agree.

Why ``max_by`` instead of the batch query's row_number window: streaming
aggregations can't host ranking windows (unbounded sort per key), but
``max_by(col, event_id)`` is an incrementally-maintainable aggregate —
Spark keeps one (value, max_id) pair per key in the state store, O(keys)
state forever, no watermark needed. At 100 TB of changelog this is the
difference between a compaction job you re-run and a view that is always
current.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def latest_wins(records: DataFrame, key_cols: tuple[str, ...] = ("user_id",)) -> DataFrame:
    """Current-state snapshot of an append-only change stream.

    Works identically on a batch frame and a streaming one (update or
    complete output mode). Ordering is by ``event_id`` (dense, unique —
    FIXTURES.md D3), ties impossible.
    """
    return records.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.max("event_id").alias("last_event_id"),
        F.max_by("event_type", "event_id").alias("last_type"),
        F.max_by("value", "event_id").alias("last_value"),
        F.count("*").cast("bigint").alias("n_versions"),
    )
