"""KMV (k-minimum-values) theta sketch: mergeable distinct counting and
set operations over the hash order statistics.

The third leg of the sketch tier (Misra–Gries for frequency, rank-grid
for quantiles, KMV for cardinality): keep the k smallest 60-bit md5
hashes of a key column per group. Because the hash is a deterministic,
engine-portable function (functions/hashing.py), the k-min set — and
therefore every estimate derived from it — is bit-identical in Spark and
DuckDB, so unlike probabilistic-by-seed sketches (HLL), the KMV surface
is fully hash-certified, not tolerance-checked.

Estimator (classic KMV / bottom-k): with h_(k) the k-th smallest hash on
a domain of size D = 2^60, distinct ≈ (k-1) · D / h_(k). Set operations
ride the same sets: the k smallest of (A ∪ B)'s hash union is KMV(A∪B);
Jaccard ≈ |KMV(A∪B) ∩ KMV(A) ∩ KMV(B)| / k, and the intersection
estimate is Jaccard × |A∪B|-estimate — the Theta-sketch composition
(Dasgupta et al., "Theta-Sketch Framework", public literature).

Scale shape: per-partition k-min summaries (one Arrow-batched pass, O(k)
state) union into a ≤ partitions×k frame; the global k-min is a window
rank over that tiny frame. The raw key column never shuffles — identical
economics to the MG and rank-grid summaries.
"""

from __future__ import annotations

import heapq
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from ..functions.hashing import token_id

HASH_DOMAIN = 1 << 60  # token_id is 15 hex digits = 60 bits


def kmv_hash(col) -> "F.Column":
    """The portable 60-bit hash KMV orders by (md5-prefix of the key)."""
    return token_id(col)


def kmv_partition_summaries(df: DataFrame, key_col: str, k: int = 64) -> DataFrame:
    """(h) — per-partition k smallest distinct hashes of ``key_col``.

    Bounded state: a heapq of size ≤ k per partition, one pass, no sort
    of the full partition. Output is ≤ partitions × k rows.
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        heap: list[int] = []  # max-heap via negation, size ≤ k
        members: set[int] = set()
        for pdf in batches:
            for h in pdf["h"]:
                h = int(h)
                if h in members:
                    continue
                if len(heap) < k:
                    heapq.heappush(heap, -h)
                    members.add(h)
                elif h < -heap[0]:
                    members.discard(-heapq.heappushpop(heap, -h))
                    members.add(h)
        yield pd.DataFrame({"h": sorted(members)}).astype({"h": "int64"})

    # NULL keys hash to NULL; Arrow would convert the batch to float64
    # (NaN) which both crashes int() and rounds 60-bit hashes — drop
    # them JVM-side so the kernel only ever sees int64
    hashed = df.select(
        kmv_hash(F.col(key_col).cast("string")).alias("h")
    ).where(F.col("h").isNotNull())
    return hashed.mapInPandas(summarize, schema="h long")


def kmv_kmin(df: DataFrame, key_col: str, k: int = 64) -> DataFrame:
    """(h, rn) — the global k smallest distinct hashes, rn = 1..k.

    Window rank runs over the ≤ partitions×k summary union, never the
    raw column.
    """
    summ = kmv_partition_summaries(df, key_col, k).distinct()
    w = Window.orderBy("h")
    return (
        summ.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("h", "rn")
    )


def kmv_estimate(kmin: DataFrame, k: int) -> DataFrame:
    """(n_kept, est) from a k-min frame: (k-1)·2^60 DIV h_(k), floor
    arithmetic so both engines agree bit-for-bit. If the domain has
    fewer than k distinct keys the k-min set IS the domain and the
    exact count is returned."""
    agg = kmin.agg(
        F.count("*").alias("n_kept"), F.max("h").alias("hk")
    )
    return agg.select(
        F.col("n_kept").cast("long").alias("n_kept"),
        F.when(F.col("n_kept") < k, F.col("n_kept"))
        .otherwise(
            F.expr(f"CAST((n_kept - 1) * CAST({HASH_DOMAIN} AS DECIMAL(38,0)) "
                   "DIV hk AS BIGINT)")
        )
        .cast("long")
        .alias("est"),
    )


# ---- streaming variant -----------------------------------------------------

KMV_STATE_SCHEMA = "hs ARRAY<LONG>"
KMV_OUTPUT_SCHEMA = "n_kept LONG, est LONG"


def kmv_stream(stream: DataFrame, key_col: str, k: int = 64) -> DataFrame:
    """Streaming KMV: one bounded k-min set maintained across
    micro-batches via applyInPandasWithState; each batch emits the
    updated (n_kept, est) row.

    Unlike the MG and rank-grid streams (whose state depends on arrival
    order), the k-min set is a pure data property — so stream-final
    equals the batch sketch EXACTLY, which the parity test asserts.
    Global sketch = one state slot, O(k) state; shard by key-hash into S
    independent sketches for corpus-scale streams (k-min sets merge by
    union + re-min, associatively).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, batches: Iterator[pd.DataFrame], state: "GroupState"):
        members: set[int] = set(state.get[0]) if state.exists else set()
        for pdf in batches:
            for h in pdf["h"]:
                members.add(int(h))
            if len(members) > k:
                members = set(sorted(members)[:k])
        state.update((sorted(members),))
        n = len(members)
        if n < k:
            est = n
        else:
            est = (n - 1) * HASH_DOMAIN // max(members)
        yield pd.DataFrame({"n_kept": [n], "est": [est]})

    return (
        stream.select(
            F.lit(0).alias("g"),
            kmv_hash(F.col(key_col).cast("string")).alias("h"),
        )
        .where(F.col("h").isNotNull())  # same NULL/NaN guard as the batch path
        .groupBy("g")
        .applyInPandasWithState(
            update,
            outputStructType=KMV_OUTPUT_SCHEMA,
            stateStructType=KMV_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
