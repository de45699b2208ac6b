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
