

def test_idempotent_batch_writer_replay_safe(spark, tmp_path):
    """Re-delivering the same batch_id must not duplicate rows; a new
    batch_id must append."""
    from console_datagen_spark.streaming.file_sink import idempotent_batch_writer

    out = str(tmp_path / "out")
    write = idempotent_batch_writer(out)
    df = spark.range(100).withColumnRenamed("id", "v")
    write(df, 7)
    write(df, 7)  # crash-replay of the same batch
    assert spark.read.parquet(out).count() == 100
    write(spark.range(50).withColumnRenamed("id", "v"), 8)
    got = spark.read.parquet(out)
    assert got.count() == 150
    assert {r._batch_id for r in got.select("_batch_id").distinct().collect()} == {7, 8}


def test_idempotent_writer_end_to_end_stream(spark, tmp_path):
    from console_datagen_spark.streaming.file_sink import idempotent_batch_writer

    src, out, ckpt = tmp_path / "src", str(tmp_path / "sout"), tmp_path / "ck"
    spark.range(20).withColumnRenamed("id", "v").coalesce(1).write.parquet(str(src))
    q = (
        spark.readStream.schema("v BIGINT")
        .parquet(str(src))
        .writeStream.foreachBatch(idempotent_batch_writer(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 20
