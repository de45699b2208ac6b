"""Unit tests for the round-5 session-3 scale operators: large-star/
small-star components, the rank-grid quantile sketch, and the
substring-span / bloom-join query laws the oracle hash can't isolate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from console_datagen_spark.operators.components_lss import dup_components_lss
from console_datagen_spark.operators.quantile_sketch import (
    quantile_partition_summaries,
    quantile_sketch_check,
)


# ---------------------------------------------------------------- LSS CC
def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def test_lss_long_chain_beats_diameter(spark):
    # a 40-node path has diameter 39: label propagation would need 39
    # rounds; LSS must finish within its default 16 (O(log n))
    chain = [(i, i + 1) for i in range(40)]
    out = dup_components_lss(_pairs(spark, chain)).collect()
    assert len(out) == 41
    assert all(r.component == 0 for r in out)


def test_lss_multiple_components_and_edge_order(spark):
    edges = [(5, 3), (3, 9), (20, 21), (7, 7 + 100)]  # two comps + pair
    out = {r.doc_id: r.component for r in dup_components_lss(_pairs(spark, edges)).collect()}
    assert out == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20, 7: 7, 107: 7}


def test_lss_matches_label_propagation(spark):
    from console_datagen_spark.operators.dedup import dup_components

    edges = [(1, 2), (2, 3), (10, 11), (11, 12), (12, 13), (50, 51), (3, 10)]
    p = _pairs(spark, edges)
    lss = {(r.doc_id, r.component) for r in dup_components_lss(p).collect()}
    lp = {(r.doc_id, r.component) for r in dup_components(p).collect()}
    assert lss == lp


def test_lss_empty_pairs(spark):
    out = dup_components_lss(_pairs(spark, [])).collect()
    assert out == []


# ------------------------------------------------------- quantile sketch
def test_quantile_summaries_weights_sum_to_n(spark):
    df = spark.range(1000).select((F.col("id") * 7 % 997).alias("v"))
    summ = quantile_partition_summaries(df, "v", k=8)
    assert summ.agg(F.sum("w")).first()[0] == 1000
    # ≤ k points per partition
    per = summ.groupBy("pid").count().agg(F.max("count")).first()[0]
    assert per <= 8


@pytest.mark.parametrize("parts", [1, 3, 7])
def test_quantile_guarantee_any_partitioning(spark, parts):
    # adversarial layout: values sorted ascending then range-partitioned,
    # so partition grids cover disjoint value ranges
    df = spark.range(5000).select(F.col("id").alias("v")).repartitionByRange(
        parts, "v"
    )
    rows = quantile_sketch_check(df, "v", k=16).collect()
    assert [r.q_permille for r in rows] == [500, 950, 990]
    for r in rows:
        assert r.n_rows == 5000
        assert r.rank_ge_target and r.rank_within_bound


def test_quantile_small_partitions(spark):
    # m < k per partition: grid degenerates to exact values, still holds
    df = spark.range(10).select(F.col("id").alias("v")).repartition(8)
    rows = quantile_sketch_check(df, "v", k=32).collect()
    assert all(r.rank_ge_target and r.rank_within_bound for r in rows)


# -------------------------------------------------- substring span law
def test_substring_spans_merge_overlaps(spark, sf_dir):
    """Every span is ≥ L tokens, spans of one doc never overlap/abut
    within L (else the island merge failed), and every span's doc shares
    its first window with some other doc."""
    from console_datagen_spark.plans import get_query

    df = get_query("dedup_substring_spans").spark(spark, sf_dir)
    rows = df.collect()
    assert all(r.span_tokens >= 16 for r in rows)
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.start_tok, r.end_tok))
    for spans in by_doc.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            # gap rule: next duplicated window starts > L after the last
            # hit of the previous island ⇒ start2 - (end1 - L + 1) > L
            assert s2 - (e1 - 16 + 1) > 16


def test_quantile_stream_across_batches(spark, tmp_path):
    """The streaming sketch accumulates across micro-batches, stays
    within its declared error budget vs the exact ranks of EVERYTHING
    ingested so far, and actually compresses (err_budget reflects it)."""
    import math
    import shutil

    from console_datagen_spark.operators.quantile_sketch import quantile_stream

    src = tmp_path / "src"
    src.mkdir()

    def drop_file(vals, name):
        stage = tmp_path / f"_stage_{name}"
        spark.createDataFrame([(int(v),) for v in vals], "v long").coalesce(
            1
        ).write.parquet(str(stage), mode="overwrite")
        shutil.move(
            str(next(stage.glob("part-*.parquet"))), str(src / f"{name}.parquet")
        )

    emitted = []

    def run_once():
        stream = spark.readStream.schema("v long").parquet(str(src))
        q = (
            quantile_stream(stream, "v", capacity=16)
            .writeStream.foreachBatch(lambda b, _: emitted.extend(b.collect()))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    b1 = [i * 7 % 101 for i in range(150)]
    b2 = [1000 + i * 13 % 97 for i in range(200)]
    drop_file(b1, "b1")
    run_once()
    drop_file(b2, "b2")
    run_once()

    final = {r.q_permille: r for r in emitted[-3:]}
    allv = sorted(b1 + b2)
    assert final[500].n_rows == 350
    for q, r in final.items():
        target = math.ceil(q * 350 / 1000)
        true_rank = sum(1 for v in allv if v <= r.est)
        assert abs(true_rank - target) <= r.err_budget, (q, true_rank, target)
        # budget must stay useful: far tighter than the trivial bound n
        assert 0 < r.err_budget < 350 / 2


def test_bloom_runtime_join_plan_broadcasts(spark, sf_dir):
    """The bloom probe must not add a fact-side shuffle: the three word
    lookups plan as broadcast joins."""
    from console_datagen_spark.plans import get_query

    df = get_query("join_bloom_runtime").spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_quantile_stream_batch_parity_on_events(spark, sf_dir, tmp_path):
    """Stream-final == batch summary on the events fixture (the
    test_drift_stream pattern): one micro-batch of every event value
    through quantile_stream(capacity=c) must land on EXACTLY the grid the
    batch summarizer builds at k=c on one partition — _compress over
    sorted weight-1 points and the batch grid share pos_j = ceil(j*m/c),
    so the per-q estimates (min v with cumw >= target) agree exactly."""
    import math
    import shutil

    from pyspark.sql import functions as F

    from console_datagen_spark.catalog import register_views
    from console_datagen_spark.operators.quantile_sketch import (
        quantile_partition_summaries,
        quantile_stream,
    )

    cap, qs = 16, (500, 950, 990)
    ev = register_views(spark, sf_dir, ("events",))["events"]
    cents = ev.select(
        F.expr("CAST(FLOOR(value * 100) AS BIGINT)").alias("v")
    )

    # batch side: one-partition grid summary at k=cap -> merged-CDF ests
    summ = sorted(
        (r.v, r.w)
        for r in quantile_partition_summaries(
            cents.coalesce(1), "v", k=cap
        ).collect()
    )
    m = sum(w for _, w in summ)

    def batch_est(q):
        target = math.ceil(q * m / 1000)
        cumw = 0
        for v, w in summ:
            cumw += w
            if cumw >= target:
                return v
        return summ[-1][0]

    # stream side: the same values as ONE micro-batch file
    src = tmp_path / "src"
    src.mkdir()
    stage = tmp_path / "_stage"
    cents.coalesce(1).write.parquet(str(stage), mode="overwrite")
    shutil.move(
        str(next(stage.glob("part-*.parquet"))), str(src / "all.parquet")
    )
    emitted = []
    stream = spark.readStream.schema("v long").parquet(str(src))
    q = (
        quantile_stream(stream, "v", capacity=cap, qs=qs)
        .writeStream.foreachBatch(lambda b, _: emitted.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    final = {r.q_permille: r for r in emitted}
    assert final[500].n_rows == m
    for qp in qs:
        assert final[qp].est == batch_est(qp), qp
