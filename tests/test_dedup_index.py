"""Persistent MinHash band index: layout, partition pruning, probe parity."""

import pathlib

import pytest

from console_datagen_spark.catalog import register_views
from console_datagen_spark.operators.dedup import incremental_dedup
from console_datagen_spark.operators.dedup_index import (
    build_minhash_index,
    probe_minhash_index,
)


@pytest.fixture(scope="module")
def split_docs(spark, sf_dir):
    docs = register_views(spark, sf_dir, ("documents",))["documents"]
    return docs.where("doc_id % 10 < 8"), docs.where("doc_id % 10 >= 8")


@pytest.fixture(scope="module")
def index_path(spark, split_docs, tmp_path_factory):
    corpus, _ = split_docs
    p = str(tmp_path_factory.mktemp("mh") / "index")
    build_minhash_index(corpus, p, n_buckets=16)
    return p


def test_index_layout_bucket_partitioned(index_path):
    dirs = list(pathlib.Path(index_path).glob("bucket=*"))
    assert len(dirs) > 1, "expected bucket= partition directories"


def test_probe_matches_inmemory_incremental(spark, split_docs, index_path):
    corpus, incoming = split_docs
    got = sorted(
        map(
            tuple,
            probe_minhash_index(
                spark, index_path, corpus, incoming, n_buckets=16
            ).collect(),
        )
    )
    want = sorted(map(tuple, incremental_dedup(corpus, incoming).collect()))
    assert got == want
    assert any(r[1] == 1 for r in got), "fixture should contain some dups"


def test_probe_prunes_bucket_partitions(spark, split_docs, index_path):
    corpus, incoming = split_docs
    # a tiny batch can't touch every bucket at 16 buckets x few band rows
    tiny = incoming.limit(2)
    probed = probe_minhash_index(spark, index_path, corpus, tiny, n_buckets=16)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # the index scan (not the text-side scans) must carry the static
    # bucket IN (...) partition filter
    assert any(
        "bucket" in plan[i : i + 120]
        for i in range(len(plan))
        if plan.startswith("PartitionFilters", i)
    ), plan[:2000]


def test_streaming_index_probe_dedup(spark, tmp_path):
    """Two micro-batch runs: batch 2's near-copy of a batch-1 doc is
    dropped by the index the first run built; genuinely new docs pass."""
    from console_datagen_spark.streaming.dedup_stream import (
        index_probe_dedup_stream,
    )

    src = tmp_path / "src"
    src.mkdir()
    idx = str(tmp_path / "index")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id LONG, text STRING, ts TIMESTAMP"

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = index_probe_dedup_stream(stream, idx, corpus, ckpt, n_buckets=8)
        q.awaitTermination()  # availableNow terminates; failures propagate

    import datetime
    import shutil

    def drop_file(rows, name):
        # the file source lists FILES in src, not nested directories —
        # write the batch elsewhere and move the part file in flat
        stage = src.parent / f"_stage_{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(stage), mode="overwrite"
        )
        part = next(stage.glob("part-*.parquet"))
        shutil.move(str(part), str(src / f"{name}.parquet"))

    t0 = datetime.datetime(2024, 1, 1)
    b1 = [
        (1, "the quick brown fox jumps over the lazy dog today", t0),
        (2, "pack my box with five dozen liquor jugs right now", t0),
        (3, "pack my box with five dozen liquor jugs right now", t0),  # exact dup of 2
    ]
    drop_file(b1, "b1")
    run_once()
    kept1 = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert kept1 == {1, 2}  # within-batch exact dup dropped

    b2 = [
        (11, "the quick brown fox jumps over the lazy dog tonight", t0),  # near-dup of 1
        (12, "completely different words about distributed query engines", t0),
    ]
    drop_file(b2, "b2")
    run_once()
    kept2 = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert kept2 == {1, 2, 12}  # 11 caught by the index built in run 1


def test_streaming_dedup_replay_is_idempotent(spark, tmp_path):
    """Replaying a processed batch (lost checkpoint) must REPLACE its
    store partitions, not append duplicates — the dynamic-overwrite
    idempotence contract."""
    import shutil

    from console_datagen_spark.streaming.dedup_stream import (
        index_probe_dedup_stream,
    )

    src = tmp_path / "src"
    src.mkdir()
    idx = str(tmp_path / "index")
    corpus = str(tmp_path / "corpus")
    schema = "doc_id LONG, text STRING, ts TIMESTAMP"

    def run_once(ckpt):
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = index_probe_dedup_stream(stream, idx, corpus, ckpt, n_buckets=8)
        q.awaitTermination()

    import datetime

    stage = tmp_path / "_stage"
    spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog", datetime.datetime(2024, 1, 1))],
        schema,
    ).coalesce(1).write.parquet(str(stage), mode="overwrite")
    shutil.move(str(next(stage.glob("part-*.parquet"))), str(src / "b1.parquet"))

    run_once(str(tmp_path / "ckpt1"))
    n1 = spark.read.parquet(corpus).count()
    # simulate a lost checkpoint: the same file replays as batch 0 again
    run_once(str(tmp_path / "ckpt2"))
    n2 = spark.read.parquet(corpus).count()
    assert n1 == n2 == 1
