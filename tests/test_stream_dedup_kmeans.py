"""Streaming dedup + k-means iterative operator."""

import pytest
from pyspark.sql import functions as F

from console_datagen_spark.catalog import register_views
from console_datagen_spark.operators.similarity import kmeans_iterate
from console_datagen_spark.streaming.dedup_stream import (
    exact_dedup_stream,
    fingerprint_dedup_stream,
)


def _drive(spark, stream_df, ckpt):
    emitted = []

    def grab(batch_df, batch_id):
        emitted.extend(batch_df.collect())

    q = (
        stream_df.writeStream.foreachBatch(grab)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return emitted


def test_exact_dedup_stream_drops_repeats(spark, tmp_path):
    src = tmp_path / "src"
    rows = [
        ("2024-01-01 00:00:01", "k1", "v1"),
        ("2024-01-01 00:00:02", "k1", "v1-dup"),
        ("2024-01-01 00:00:03", "k2", "v2"),
        ("2024-01-01 00:00:04", "k2", "v2-dup"),
        ("2024-01-01 00:00:05", "k3", "v3"),
    ]
    (
        spark.createDataFrame(rows, "ts STRING, k STRING, payload STRING")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1)
        .write.parquet(str(src))
    )
    stream = spark.readStream.schema(
        "ts TIMESTAMP, k STRING, payload STRING"
    ).parquet(str(src))
    out = _drive(spark, exact_dedup_stream(stream, ["k"]), tmp_path / "c1")
    assert sorted(r.k for r in out) == ["k1", "k2", "k3"]


def test_fingerprint_dedup_stream(spark, tmp_path):
    src = tmp_path / "src2"
    rows = [
        ("2024-01-01 00:00:01", "same content"),
        ("2024-01-01 00:00:02", "same content"),
        ("2024-01-01 00:00:03", "other content"),
    ]
    (
        spark.createDataFrame(rows, "ts STRING, text STRING")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1)
        .write.parquet(str(src))
    )
    stream = spark.readStream.schema("ts TIMESTAMP, text STRING").parquet(str(src))
    out = _drive(
        spark, fingerprint_dedup_stream(stream, "text"), tmp_path / "c2"
    )
    assert sorted(r.text for r in out) == ["other content", "same content"]
    assert "_fp" not in {c for r in out for c in r.asDict()}


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return register_views(spark, sf_dir, ("embeddings",))["embeddings"]


def test_kmeans_plan_building_triggers_one_driver_action(spark, embeddings, monkeypatch):
    # the dim lookup is hoisted: building the iterative plan must hit the
    # driver exactly once (.first() for the vector dim), never per iteration
    cls = type(embeddings)  # the concrete (classic) DataFrame class
    calls = []
    orig_first = cls.first
    monkeypatch.setattr(
        cls, "first", lambda self: (calls.append(1), orig_first(self))[1]
    )
    kmeans_iterate(embeddings, k=5, iterations=3)
    assert len(calls) == 1


def test_embedding_lsh_pairs_subset_of_exact(spark, embeddings):
    from console_datagen_spark.operators.similarity import (
        embedding_dup_pairs,
        embedding_dup_pairs_lsh,
    )

    exact = {
        (r.vec_a, r.vec_b) for r in embedding_dup_pairs(embeddings, 0.4).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b)
        for r in embedding_dup_pairs_lsh(embeddings, threshold=0.4).collect()
    }
    # every LSH pair passes the same exact-cosine verify → subset; and the
    # banding must actually recall a usable fraction of the true pairs
    assert lsh <= exact
    if exact:
        assert len(lsh) >= len(exact) * 0.3, (len(lsh), len(exact))


def test_dup_components_min_label(spark):
    from console_datagen_spark.operators.dedup import dup_components

    # two chains and an isolated pair: {1,2,3,4} via 1-2,2-3,3-4; {9,11}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (9, 11)], "doc_a LONG, doc_b LONG"
    )
    got = {
        (r.doc_id, r.component) for r in dup_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (9, 9), (11, 9)}


def test_dup_components_converges_on_long_chain(spark):
    from console_datagen_spark.operators.dedup import dup_components

    # a 12-node path needs ~log-to-diameter rounds; must still hit the
    # exact min-id fixpoint within max_iter
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 112)], "doc_a LONG, doc_b LONG"
    )
    comps = {r.component for r in dup_components(pairs).collect()}
    assert comps == {100}


def test_dup_components_reliable_checkpoint(spark, tmp_path):
    from console_datagen_spark.operators.dedup import dup_components

    # same fixpoint with reliable checkpointing (flaky-executor mode) —
    # the checkpoint dir must actually receive RDD checkpoint data
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (9, 11)], "doc_a LONG, doc_b LONG"
    )
    ckpt = str(tmp_path / "cc_ckpt")
    got = {
        (r.doc_id, r.component)
        for r in dup_components(pairs, checkpoint_dir=ckpt).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (9, 9), (11, 9)}
    import os

    assert any(os.scandir(ckpt)), "no reliable checkpoint data written"


def test_dup_components_nonconvergence_raises(spark):
    import pytest as _pytest

    from console_datagen_spark.operators.dedup import dup_components

    # a 6-node path cannot converge in 1 round; partial labels would
    # silently disagree with the exact oracle, so it must raise
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(200, 206)], "doc_a LONG, doc_b LONG"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        dup_components(pairs, max_iter=1)


def test_simhash_banded_equals_allpairs(spark, sf_dir):
    from console_datagen_spark.catalog import register_views as rv
    from console_datagen_spark.operators.dedup import (
        simhash_pairs,
        simhash_pairs_banded,
    )

    docs = rv(spark, sf_dir, ("documents",))["documents"]
    brute = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_pairs(spark, docs, max_hamming=6).collect()
    }
    banded = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_pairs_banded(spark, docs, max_hamming=6).collect()
    }
    # pigeonhole banding is lossless within the hamming ball
    assert banded == brute


def test_kmeans_assignments(spark, embeddings):
    out = kmeans_iterate(embeddings, k=5, iterations=2)
    rows = out.collect()
    n = embeddings.count()
    assert len(rows) == n  # every vector assigned exactly once
    clusters = {r.cluster for r in rows}
    assert 1 < len(clusters) <= 5
    # determinism across runs on the same session
    again = kmeans_iterate(embeddings, k=5, iterations=2).collect()
    assert sorted((r.vec_id, r.cluster) for r in rows) == sorted(
        (r.vec_id, r.cluster) for r in again
    )


def test_dup_component_stats_and_rounds_telemetry(spark):
    from console_datagen_spark.operators import dedup as D

    # {1,2,3,4} (size 4), {9,11} (size 2), {20,21} (size 2)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (9, 11), (20, 21)], "doc_a LONG, doc_b LONG"
    )
    hist = {
        (r.csize, r.n_components)
        for r in D.dup_component_stats(pairs).collect()
    }
    assert hist == {(4, 1), (2, 2)}
    # rounds telemetry: the 4-chain needs 3 label rounds + 1 confirming
    # round; must be recorded and bounded by the default max_iter
    rounds = D.last_component_rounds()
    assert rounds is not None and 2 <= rounds <= 20, rounds
