"""Misra–Gries heavy hitters — bounded-memory frequent-key sketch.

The distributed form: each partition computes a k-counter MG summary
(Arrow-batched mapInPandas — exact value counts per Arrow batch, then MG
merge into the running counters), the per-partition summaries (k rows
each) union into a tiny frame, and the final merge is the standard
summed-then-trimmed MG (sum counters per key, subtract the (k+1)-th
largest, keep positives — Agarwal et al., "Mergeable Summaries").

Guarantees (any partitioning, any arrival order):
- every key with true count > N/(k+1) appears in the summary;
- every estimate underestimates by at most N/(k+1) and never
  overestimates.

The counter CONTENTS depend on partitioning (like every streaming
sketch), so the oracle-checkable surface is the guarantee itself:
``heavy_hitters_check`` emits the exact heavy-key count plus the two
guarantee booleans — deterministic whatever the partitioning — mirroring
the HLL/percentile sketch-certification contract (agg_sketch_check).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def _mg_update(counters: dict, key, cnt: int, k: int) -> None:
    if key in counters:
        counters[key] += cnt
    elif len(counters) < k:
        counters[key] = cnt
    else:
        # decrement all by the smallest absorbable amount
        dec = min(cnt, min(counters.values()))
        for c in list(counters):
            counters[c] -= dec
            if counters[c] == 0:
                del counters[c]
        if cnt > dec:
            counters[key] = cnt - dec


def mg_partition_summaries(df: DataFrame, key_col: str, k: int = 16) -> DataFrame:
    """(key, est) — one ≤k-counter MG summary per partition."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for b in batches:
            for key, cnt in b[key_col].value_counts().items():
                _mg_update(counters, key, int(cnt), k)
        yield pd.DataFrame(
            {"key": list(counters.keys()), "est": list(counters.values())}
        )

    key_type = df.schema[key_col].dataType.simpleString()
    return df.select(key_col).mapInPandas(
        summarize, schema=f"key {key_type}, est long"
    )


def mg_merge(summaries: DataFrame, k: int = 16) -> DataFrame:
    """Merge per-partition summaries into one ≤k-counter summary.

    Sum counters per key, then subtract the (k+1)-th largest summed value
    from every counter and keep positives — the mergeable-summaries trim,
    as relational ops over the tiny (k × partitions)-row frame.
    """
    summed = summaries.groupBy("key").agg(F.sum("est").alias("est"))
    w = Window.orderBy(F.col("est").desc(), F.col("key"))
    ranked = summed.withColumn("rn", F.row_number().over(w))
    kth1 = ranked.where(F.col("rn") == k + 1).select(
        F.col("est").alias("dec")
    )
    trimmed = summed.crossJoin(
        F.broadcast(kth1.unionByName(
            summed.sparkSession.createDataFrame([(0,)], "dec long")
        ).groupBy().agg(F.max("dec").alias("dec")))
    )
    return (
        trimmed.select("key", (F.col("est") - F.col("dec")).alias("est"))
        .where(F.col("est") > 0)
    )


def heavy_hitters_check(df: DataFrame, key_col: str, k: int = 16) -> DataFrame:
    """One-row guarantee certification: (k, n_rows, n_true_heavy,
    all_heavy_found, no_overestimate, underestimate_within_bound).

    ``n_true_heavy`` = exact count of keys with true frequency > N/(k+1);
    the three booleans assert the MG guarantees against the EXACT counts
    — true for any partitioning, hence oracle-checkable.
    """
    summary = mg_merge(mg_partition_summaries(df, key_col, k), k)
    exact = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("true_cnt")
    )
    joined = exact.join(summary, "key", "full_outer").select(
        "key",
        F.coalesce("true_cnt", F.lit(0)).alias("true_cnt"),
        F.coalesce("est", F.lit(0)).alias("est"),
        F.col("est").isNotNull().alias("found"),
    )
    n = df.count()
    bound = n // (k + 1)
    return joined.agg(
        F.lit(k).alias("k"),
        F.lit(n).alias("n_rows"),
        F.sum(F.when(F.col("true_cnt") > bound, 1).otherwise(0))
        .cast("long")
        .alias("n_true_heavy"),
        F.min(
            F.when(F.col("true_cnt") > bound, F.col("found")).otherwise(F.lit(True))
        ).alias("all_heavy_found"),
        F.min(F.col("est") <= F.col("true_cnt")).alias("no_overestimate"),
        F.min(F.col("true_cnt") - F.col("est") <= bound).alias(
            "underestimate_within_bound"
        ),
    )


# ---- streaming variant -----------------------------------------------------

MG_STATE_SCHEMA = "keys ARRAY<STRING>, ests ARRAY<LONG>"
MG_OUTPUT_SCHEMA = "key STRING, est LONG"


def mg_stream(stream: DataFrame, key_col: str, k: int = 16) -> DataFrame:
    """Streaming Misra–Gries: one bounded k-counter summary maintained
    across micro-batches via applyInPandasWithState; each batch emits the
    updated summary (update mode).

    State is a single group (the sketch is global), so the stateful task
    is one slot — but its work per batch is O(batch distinct keys) after
    pandas value_counts, and state is O(k). For corpus-scale streams,
    pre-aggregate per micro-batch upstream (foreachBatch + the batch
    operators) or shard by key-hash into S independent sketches and
    mg_merge them on read — the summaries are mergeable by construction.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, batches: Iterator[pd.DataFrame], state: "GroupState"):
        counters: dict = (
            dict(zip(state.get[0], state.get[1])) if state.exists else {}
        )
        for pdf in batches:
            for kk, cnt in pdf["key"].value_counts().items():
                _mg_update(counters, kk, int(cnt), k)
        state.update((list(counters.keys()), [int(v) for v in counters.values()]))
        yield pd.DataFrame(
            {"key": list(counters.keys()), "est": list(counters.values())}
        )

    return (
        stream.select(F.lit(0).alias("g"), F.col(key_col).cast("string").alias("key"))
        .groupBy("g")
        .applyInPandasWithState(
            update,
            outputStructType=MG_OUTPUT_SCHEMA,
            stateStructType=MG_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
