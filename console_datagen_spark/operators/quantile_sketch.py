"""Mergeable rank-grid quantile sketch with certified error bounds.

The quantile analog of the Misra–Gries contract (operators/
heavy_hitters.py): each partition compresses its sorted values into a
k-point grid summary (value, weight) whose partial ranks are exact at
the grid points, the per-partition summaries union into a tiny frame
(≤ partitions × k rows), and quantiles are estimated from the merged
cumulative weights — the one-pass, bounded-memory shape every
distributed quantile sketch (GK, KLL, t-digest) reduces to. At 100 TB
the full value column never leaves its scan stage: only P×k summary
rows shuffle.

Grid summary of a sorted partition a[1..m] with k' = min(k, m) points:
pos_j = ceil(j·m/k'), weight_j = pos_j − pos_{j−1}, value_j = a[pos_j].
By construction sum(weights) = m and the summary's rank function S_i
satisfies 0 ≤ rank_i(x) − S_i(x) ≤ maxw_i − 1 for every x, where
maxw_i = max weight in partition i (the summary never OVERcounts a
rank, and undercounts by less than one grid cell).

Merged guarantee (any partitioning, any order): for the estimate v_q =
min{v : S(v) ≥ target} with target = ceil(q·N/1000),

    target ≤ true_rank(v_q) ≤ target + Σ_i maxw_i + max_i maxw_i

Like every sketch, the estimate itself depends on the partitioning, so
the oracle-checkable surface is the guarantee: ``quantile_sketch_check``
emits per-q booleans (always TRUE by the theorem) plus the
partition-independent n_rows/k — mirroring heavy_hitters_check and
agg_sketch_check.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def quantile_partition_summaries(df: DataFrame, value_col: str, k: int = 32) -> DataFrame:
    """(pid, v, w) — one ≤k-point grid summary per partition.

    ``value_col`` must be an integral column (callers pre-scale floats to
    cents); exactness of the guarantee needs exact comparisons.
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        chunks = [b[value_col] for b in batches if len(b)]
        if not chunks:
            yield pd.DataFrame({"pid": [], "v": [], "w": []}).astype(
                {"pid": "int32", "v": "int64", "w": "int64"}
            )
            return
        vals = pd.concat(chunks).sort_values(ignore_index=True)
        m = len(vals)
        kp = min(k, m)
        pos = [math.ceil(j * m / kp) for j in range(kp + 1)]  # pos[0] = 0
        yield pd.DataFrame(
            {
                "pid": pid,
                "v": [int(vals.iloc[p - 1]) for p in pos[1:]],
                "w": [pos[j] - pos[j - 1] for j in range(1, kp + 1)],
            }
        ).astype({"pid": "int32", "v": "int64", "w": "int64"})

    return df.select(value_col).mapInPandas(summarize, schema="pid int, v long, w long")


def quantile_sketch_check(
    df: DataFrame,
    value_col: str,
    k: int = 32,
    qs: tuple[int, ...] = (500, 950, 990),
) -> DataFrame:
    """Certify the merged-summary rank guarantee for each q (permille).

    Output: (q_permille, n_rows, k, rank_ge_target, rank_within_bound) —
    booleans TRUE whenever the implementation honors the sketch theorem,
    for ANY partitioning of ``df``. Everything after the summaries is a
    declarative plan over the tiny summary frame; the only full-data pass
    beyond the summaries is the exact-rank probe (a 3-row broadcast
    cross join + conditional count), which exists purely to certify.
    """
    spark = df.sparkSession
    vals = df.select(F.col(value_col).cast("long").alias("v"))
    summ = quantile_partition_summaries(vals, "v", k).cache()

    stats = summ.groupBy("pid").agg(F.max("w").alias("maxw"), F.sum("w").alias("m"))
    bounds = stats.agg(
        F.sum("m").alias("n"),
        (F.sum("maxw") + F.max("maxw")).alias("bound"),
    )

    # merged CDF over distinct values (duplicate grid values across
    # partitions collapse; cumulative weight ordered by value)
    cum = (
        summ.groupBy("v")
        .agg(F.sum("w").alias("w"))
        .withColumn(
            "cumw",
            F.sum("w").over(
                Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )

    q_df = spark.createDataFrame([(q,) for q in qs], "q_permille int")
    targets = q_df.crossJoin(F.broadcast(bounds)).select(
        "q_permille",
        "n",
        "bound",
        F.expr("CAST(ceil(q_permille * n / 1000.0) AS BIGINT)").alias("target"),
    )
    ests = (
        targets.join(F.broadcast(cum), F.col("cumw") >= F.col("target"))
        .groupBy("q_permille", "n", "bound", "target")
        .agg(F.min("v").alias("est"))
    )
    ranks = (
        vals.crossJoin(F.broadcast(ests))
        .groupBy("q_permille", "n", "bound", "target")
        .agg(F.sum(F.when(F.col("v") <= F.col("est"), 1).otherwise(0)).alias("true_rank"))
    )
    out = ranks.select(
        F.col("q_permille").cast("int").alias("q_permille"),
        F.col("n").cast("long").alias("n_rows"),
        F.lit(k).cast("int").alias("k"),
        (F.col("true_rank") >= F.col("target")).alias("rank_ge_target"),
        (F.col("true_rank") <= F.col("target") + F.col("bound")).alias(
            "rank_within_bound"
        ),
    ).orderBy("q_permille")
    return out


# ---- streaming variant -----------------------------------------------------

QS_STATE_SCHEMA = "vs ARRAY<LONG>, ws ARRAY<LONG>, n LONG, err LONG"
QS_OUTPUT_SCHEMA = "q_permille INT, n_rows LONG, est LONG, err_budget LONG"


def _compress(points: list[tuple[int, int]], c: int) -> tuple[list, int]:
    """Compress sorted (v, w) points to ≤c grid points; returns the new
    points and the rank-error increase of this compression (≤ max new
    weight): the new summary's rank function differs from the old one by
    at most one grid cell at any value."""
    total = sum(w for _, w in points)
    out: list[tuple[int, int]] = []
    prev_pos = 0
    cumw = 0
    it = iter(points)
    v, w = next(it)
    for j in range(1, c + 1):
        pos = math.ceil(j * total / c)
        if pos <= prev_pos:
            continue
        while cumw + w < pos:
            cumw += w
            v, w = next(it)
        out.append((v, pos - prev_pos))
        prev_pos = pos
    return out, max(w for _, w in out)


def quantile_stream(
    stream: DataFrame,
    value_col: str,
    capacity: int = 256,
    qs: tuple[int, ...] = (500, 950, 990),
) -> DataFrame:
    """Streaming quantiles with a tracked error budget — the quantile
    analog of mg_stream.

    One bounded summary (≤2·capacity points) is maintained across
    micro-batches via applyInPandasWithState: raw batch values append as
    exact weight-1 points (zero added error); whenever the summary
    exceeds 2·capacity points it recompresses to ``capacity`` grid
    points, adding ≤ max-new-weight rank error, which accumulates in the
    state's ``err``. Each batch emits per-q rows whose honest guarantee
    is |true_rank(est) − target| ≤ err_budget — certified by the
    streaming test against exact ranks over everything ingested so far.

    Like mg_stream, the global sketch is one state slot; shard by
    key-hash into S independent sketches for corpus-scale streams (grid
    summaries merge associatively).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, batches: Iterator[pd.DataFrame], state: "GroupState"):
        if state.exists:
            vs, ws, n, err = state.get
            points = list(zip(vs, ws))
        else:
            points, n, err = [], 0, 0
        for pdf in batches:
            vals = pdf["v"].astype("int64")
            n += len(vals)
            points.extend((int(v), 1) for v in vals)
            points.sort()
            if len(points) > 2 * capacity:
                points, maxw = _compress(points, capacity)
                err += maxw
        state.update(
            ([v for v, _ in points], [w for _, w in points], int(n), int(err))
        )
        maxw = max((w for _, w in points), default=0)
        rows = []
        for q in qs:
            target = math.ceil(q * n / 1000)
            cumw, est = 0, points[-1][0] if points else 0
            for v, w in points:
                cumw += w
                if cumw >= target:
                    est = v
                    break
            rows.append((q, n, est, err + maxw))
        yield pd.DataFrame(
            rows, columns=["q_permille", "n_rows", "est", "err_budget"]
        )

    return (
        stream.select(
            F.lit(0).alias("g"), F.col(value_col).cast("long").alias("v")
        )
        .groupBy("g")
        .applyInPandasWithState(
            update,
            outputStructType=QS_OUTPUT_SCHEMA,
            stateStructType=QS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
