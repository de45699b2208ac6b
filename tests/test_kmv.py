"""KMV sketch operator: mergeability (partitioning invariance) and
estimate accuracy."""

from __future__ import annotations

from console_datagen_spark.operators.kmv import kmv_estimate, kmv_kmin


def test_kmin_is_partitioning_invariant(spark):
    df = spark.createDataFrame(
        [(f"user{i % 700}",) for i in range(5000)], "uid string"
    )
    k = 32
    one = {r.h for r in kmv_kmin(df.repartition(1), "uid", k).collect()}
    many = {r.h for r in kmv_kmin(df.repartition(13), "uid", k).collect()}
    assert one == many
    assert len(one) == k


def test_estimate_within_kmv_error(spark):
    """Classic KMV relative error is ~1/sqrt(k-2); assert a loose 3x of
    that on a 5000-distinct synthetic domain at k=64."""
    n_distinct, k = 5000, 64
    df = spark.createDataFrame(
        [(f"key-{i}",) for i in range(n_distinct)], "uid string"
    )
    est = kmv_estimate(kmv_kmin(df, "uid", k), k).collect()[0].est
    rel = abs(est - n_distinct) / n_distinct
    assert rel < 3.0 / (k - 2) ** 0.5, (est, rel)


def test_small_domain_is_exact(spark):
    df = spark.createDataFrame([(f"u{i}",) for i in range(10)], "uid string")
    row = kmv_estimate(kmv_kmin(df, "uid", 64), 64).collect()[0]
    assert row.n_kept == 10 and row.est == 10


def test_kmv_stream_batch_parity(spark, tmp_path):
    """Stream-final == batch sketch EXACTLY (k-min is a data property):
    same n_kept, same estimate, across two micro-batches."""
    import shutil

    from console_datagen_spark.operators.kmv import kmv_stream

    k = 32
    src = tmp_path / "src"
    src.mkdir()

    def drop_file(lo, hi, name):
        stage = tmp_path / f"_stage_{name}"
        spark.createDataFrame(
            [(f"user{i}",) for i in range(lo, hi)], "uid string"
        ).coalesce(1).write.parquet(str(stage), mode="overwrite")
        shutil.move(
            str(next(stage.glob("part-*.parquet"))), str(src / f"{name}.parquet")
        )

    emitted = []

    def run_once():
        stream = spark.readStream.schema("uid string").parquet(str(src))
        q = (
            kmv_stream(stream, "uid", k=k)
            .writeStream.foreachBatch(lambda b, _: emitted.extend(b.collect()))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drop_file(0, 400, "b1")
    run_once()
    drop_file(300, 900, "b2")  # overlapping: dedup must happen in-state
    run_once()

    final = emitted[-1]
    batch_df = spark.createDataFrame(
        [(f"user{i}",) for i in range(900)], "uid string"
    )
    want = kmv_estimate(kmv_kmin(batch_df, "uid", k), k).collect()[0]
    assert final.n_kept == want.n_kept
    assert final.est == want.est


def test_null_keys_are_dropped_not_crashed(spark):
    """NULL keys must not reach the Arrow kernel (NaN int() crash /
    float64 hash corruption) — they are dropped JVM-side."""
    df = spark.createDataFrame(
        [(f"u{i}",) for i in range(20)] + [(None,), (None,)], "uid string"
    )
    row = kmv_estimate(kmv_kmin(df, "uid", 64), 64).collect()[0]
    assert row.n_kept == 20 and row.est == 20
