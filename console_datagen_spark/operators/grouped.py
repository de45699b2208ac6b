"""Grouped-map operators via applyInPandas (SURVEY §2.10 grouped tier).

Per-group pandas computation for semantics that are awkward as window
functions but natural as a per-group frame — here: per-user event-gap
statistics in exact integer microseconds (no float drift, so the DuckDB
oracle matches bit-for-bit; see plans/extras.py ``grouped_event_gaps``).

Scale: applyInPandas shuffles once on the grouping key; each group must
fit in one task's memory — for per-user event history that's the natural
bound (a user's events, not the corpus).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

GAP_SCHEMA = (
    "user_id LONG, event_id LONG, seq INT, gap_us LONG"
)


def event_gaps(events: DataFrame) -> DataFrame:
    """Per user, events ordered by (ts, event_id): sequence number and the
    gap to the previous event in integer microseconds (0 for the first).
    """

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        # explicit µs resolution — don't assume the Arrow batch arrives as
        # datetime64[ns] (pandas 2.x may hand over [us] directly)
        ts_us = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        ts_us = pd.Series(ts_us)
        gaps = ts_us.diff().fillna(0).astype("int64")
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "seq": range(1, len(pdf) + 1),
                "gap_us": gaps,
            }
        )

    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandas(per_user, schema=GAP_SCHEMA)
    )


def arrow_token_stats(documents):
    """(doc_id, n_tokens) via ``mapInArrow`` — the zero-copy Arrow batch
    API (§2.10's fourth Python surface next to mapInPandas /
    applyInPandas(+State) / UDTF). The kernel runs pyarrow.compute on the
    RecordBatch directly — no pandas materialization, so for wide string
    columns this is the cheapest Python hop there is. Certified by parity
    with the pure-SQL token counter (tests), not registered as a query:
    the SQL form IS the production path; this demonstrates the escape
    hatch for kernels SQL can't express.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def count_tokens(batches):
        for b in batches:
            toks = pc.split_pattern(b.column("text"), " ")
            yield pa.RecordBatch.from_arrays(
                [b.column("doc_id"), pc.list_value_length(toks).cast("int64")],
                ["doc_id", "n_tokens"],
            )

    return documents.select("doc_id", "text").mapInArrow(
        count_tokens, schema="doc_id long, n_tokens long"
    )
