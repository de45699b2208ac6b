"""Stream-static enrichment joins (beyond-reference streaming surface).

The canonical training-data-pipeline shape: a stream of incoming items
joined against a static reference corpus (dim tables, dedup fingerprint
sets, quality allowlists). Spark plans a broadcast join per micro-batch —
no stream-side shuffle, and the static side can be refreshed by re-reading
per batch in foreachBatch if it changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def enrich_stream(
    stream: DataFrame,
    static: DataFrame,
    on: list[str],
    how: str = "left",
) -> DataFrame:
    """Join a streaming frame against a broadcast static frame."""
    return stream.join(F.broadcast(static), on, how)


def filter_known_duplicates(
    stream: DataFrame,
    fingerprints: DataFrame,
    content_col: str = "text",
) -> DataFrame:
    """Drop stream rows whose content hash is in a static fingerprint set.

    The static side carries one column ``fp`` (md5 hex). Anti-join is
    broadcast: the stream never shuffles.
    """
    withfp = stream.withColumn("fp", F.md5(F.col(content_col)))
    return withfp.join(F.broadcast(fingerprints), "fp", "left_anti").drop("fp")


# ---- streaming point-in-time (as-of) enrichment ----------------------------
# The streaming form of plans/features.join_point_in_time: feature events
# update a per-key carry (latest change so far), spine events emit
# enriched with the carry value — the always-current feature store read
# path. State is ONE row per key (the latest feature version), so at
# 100 TB of changelog the state store holds O(active keys), not history.
#
# Ordering contract: within a micro-batch, rows are applied in
# (ts, side, event_id) order with feature rows before spine rows at the
# same timestamp — byte-identical to the batch as-of's union-sort carry
# (right side sorts first at equal ts). Across batches the source must
# deliver in event-time order (the reference's processing-time model);
# out-of-order streams need watermark buffering upstream, which is
# deliberately out of scope here and documented.

from collections.abc import Iterator  # noqa: E402
from typing import Any  # noqa: E402

import pandas as pd  # noqa: E402
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout  # noqa: E402

ASOF_STATE_SCHEMA = "feat_event_id LONG, feat_cents LONG"
ASOF_OUTPUT_SCHEMA = (
    "user_id LONG, event_id LONG, feat_event_id LONG, feat_cents LONG"
)


def _asof_update(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    carry_id, carry_cents = state.get if state.exists else (None, None)
    out: list[tuple[int, int | None, int | None]] = []
    # a group larger than arrow.maxRecordsPerBatch arrives as MULTIPLE
    # pandas chunks in arbitrary order — sorting per chunk would apply a
    # later-ts feature before an earlier-ts purchase across a chunk
    # boundary, so the whole group must be gathered before the one sort
    chunks = [c for c in batches if len(c)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0].copy()
        pdf["spine"] = (pdf["event_type"] == "purchase").astype("int64")
        # same-instant feature updates land before the spine row reads
        # them; among features the highest event_id wins (applied last)
        pdf = pdf.sort_values(["ts", "spine", "event_id"])
        for spine, event_id, value in zip(
            pdf["spine"], pdf["event_id"], pdf["value"]
        ):
            if spine == 1:
                out.append((int(event_id), carry_id, carry_cents))
            else:
                carry_id = int(event_id)
                carry_cents = int(value * 100 // 1)
    if carry_id is not None:
        state.update((carry_id, carry_cents))
    yield pd.DataFrame(
        {
            "user_id": pd.Series([user_id] * len(out), dtype="int64"),
            "event_id": pd.Series([e for e, _, _ in out], dtype="int64"),
            "feat_event_id": pd.Series(
                [i for _, i, _ in out], dtype="Int64"
            ),
            "feat_cents": pd.Series([c for _, _, c in out], dtype="Int64"),
        }
    )


def asof_enrich_stream(records: DataFrame) -> DataFrame:
    """Enrich streaming 'purchase' rows with the latest prior feature
    value per user (point-in-time semantics, O(1) state per key)."""
    return (
        records.select("user_id", "event_id", "event_type", "value", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _asof_update,
            outputStructType=ASOF_OUTPUT_SCHEMA,
            stateStructType=ASOF_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
