"""Custom stateful counter via applyInPandasWithState (SURVEY §1.2, §2.10).

The plain streaming groupBy().count() (streaming/counters.py) gives the
counter table, but the reference fires a side-effect check on *exact*
count thresholds — every 5000th record per partition
(DataGenerator.java:517, 541-545). A hash-agg can't see threshold
crossings (it only emits totals), so this operator keeps per-key state
and emits one row per micro-batch with the count delta and how many
5000-boundaries were crossed — the truncation trigger feed.

This is the (b)-tier custom-operator pattern from the north star: Arrow-
batched grouped-map with explicit GroupState, used only because built-in
aggs genuinely can't express the semantics.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "count LONG"
OUTPUT_SCHEMA = (
    "topic STRING, partition INT, count LONG, delta LONG, thresholds_crossed INT"
)
CHECK_EVERY = 5000  # DataGenerator.java:517, 541


def _update_counter(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    topic, partition = key
    prev = state.get[0] if state.exists else 0
    seen = 0
    for pdf in batches:
        seen += len(pdf)
    cur = prev + seen
    state.update((cur,))
    crossed = cur // CHECK_EVERY - prev // CHECK_EVERY
    yield pd.DataFrame(
        {
            "topic": [topic],
            "partition": [partition],
            "count": [cur],
            "delta": [seen],
            "thresholds_crossed": [crossed],
        }
    )


def stateful_counts(envelopes: DataFrame) -> DataFrame:
    """(topic, partition) → running count + threshold crossings per batch.

    Input: envelope stream with (topic, partition, ...) columns.
    State: one LONG per key (bounded by topics × partitions — tiny).
    """
    return (
        envelopes.select("topic", "partition")
        .groupBy("topic", "partition")
        .applyInPandasWithState(
            _update_counter,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---- transformWithState variant (Spark 4 stateful-processor API) ----------
#
# Same counter semantics on the successor API: explicit named state
# variables on a StatefulProcessorHandle, RocksDB-backed state store,
# and room for timers / TTL / multiple state vars that GroupState lacks.
# Requires spark.sql.streaming.stateStore.providerClass =
# RocksDBStateStoreProvider (transformWithState is RocksDB-only).

from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle


class CounterProcessor(StatefulProcessor):
    """Per-(topic, partition) running count + 5000-boundary crossings."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._count = handle.getValueState("count", STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple[Any, ...], rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        topic, partition = key
        got = self._count.get() if self._count.exists() else None
        prev = got[0] if got is not None else 0
        seen = sum(len(pdf) for pdf in rows)
        cur = prev + seen
        self._count.update((cur,))
        yield pd.DataFrame(
            {
                "topic": [topic],
                "partition": [partition],
                "count": [cur],
                "delta": [seen],
                "thresholds_crossed": [cur // CHECK_EVERY - prev // CHECK_EVERY],
            }
        )

    def close(self) -> None:
        pass


def stateful_counts_tws(envelopes: DataFrame) -> DataFrame:
    """transformWithStateInPandas spelling of ``stateful_counts``."""
    return (
        envelopes.select("topic", "partition")
        .groupBy("topic", "partition")
        .transformWithStateInPandas(
            statefulProcessor=CounterProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
