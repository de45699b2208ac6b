"""Python DataSource generator: byte-parity with the SQL path + streaming."""

import pytest

from console_datagen_spark.sources.datasource import DatagenDataSource
from console_datagen_spark.sources.generator import generate_batch


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(DatagenDataSource)
    return spark


def test_batch_read_matches_sql_generator(registered):
    spark = registered
    via_ds = (
        spark.read.format("console_datagen")
        .option("n", 64)
        .option("numPartitions", 4)
        .load()
        .orderBy("record_id")
    )
    via_sql = generate_batch(spark, 64).orderBy("record_id")
    # nullability differs (range() ids are non-null); names+types must match
    assert via_ds.dtypes == via_sql.dtypes
    assert via_ds.collect() == via_sql.collect()


def test_partition_count_honored(registered):
    df = (
        registered.read.format("console_datagen")
        .option("n", 100)
        .option("numPartitions", 7)
        .load()
    )
    assert df.rdd.getNumPartitions() == 7
    assert df.count() == 100


def test_stream_read_resumes_from_offsets(registered, tmp_path):
    spark = registered
    ckpt = tmp_path / "ck"
    got = []

    def run():
        q = (
            spark.readStream.format("console_datagen")
            .option("rowsPerBatch", 25)
            .load()
            .writeStream.foreachBatch(
                lambda df, _bid: got.extend(r.record_id for r in df.collect())
            )
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    n_first = len(got)
    assert n_first >= 25 and sorted(got) == list(range(n_first))
    run()  # restart: offsets come from the checkpoint, ids must continue
    assert sorted(got) == list(range(len(got)))
    assert len(got) > n_first


def test_counter_sink_counts_per_topic(registered, tmp_path):
    """Generator stream -> counter sink: per-topic counts folded from the
    executors' commit messages match the records generated."""
    from console_datagen_spark.sources.datasource import DatagenCounterSink

    spark = registered
    spark.dataSource.register(DatagenCounterSink)
    log = tmp_path / "counts.jsonl"
    q = (
        spark.readStream.format("console_datagen")
        .option("rowsPerBatch", 30)
        .load()
        .writeStream.format("console_datagen_counter")
        .option("path", str(log))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    import json

    lines = [json.loads(x) for x in log.read_text().splitlines()]
    assert lines, "no committed batches"
    total = sum(n for line in lines for n in line["counts"].values())
    assert total >= 30
    # round-robin routing: every generated topic appears
    topics = {t for line in lines for t in line["counts"]}
    assert len(topics) == 3


def test_counter_sink_commit_idempotent_by_batch_id(tmp_path):
    """A crash between sink commit and checkpoint write re-delivers the
    batch; re-committing the same batch_id must not duplicate its line."""
    import json

    from console_datagen_spark.sources.datasource import (
        CounterStreamWriter,
        CountMessage,
    )

    log = tmp_path / "counts.jsonl"
    w = CounterStreamWriter({"path": str(log)})
    msgs = [CountMessage(counts={"t0": 3}), CountMessage(counts={"t0": 2, "t1": 1})]
    w.commit(msgs, batchId=7)
    w.commit(msgs, batchId=7)  # replay after simulated crash
    w.commit(msgs, batchId=8)
    lines = [json.loads(x) for x in log.read_text().splitlines()]
    assert [x["batch_id"] for x in lines] == [7, 8]
    assert lines[0]["counts"] == {"t0": 5, "t1": 1}
