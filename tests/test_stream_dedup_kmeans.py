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
