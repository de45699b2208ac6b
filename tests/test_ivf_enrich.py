"""Persistent IVF index (partition pruning) + stream-static enrichment."""

import pytest
from pyspark.sql import functions as F

from console_datagen_spark.catalog import register_views
from console_datagen_spark.operators.ivf_index import (
    build_ivf_index,
    probe_ivf_index,
    query_vectors,
)
from console_datagen_spark.operators.similarity import PQ_M, ivf_topk
from console_datagen_spark.streaming.enrich import (
    enrich_stream,
    filter_known_duplicates,
)


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return register_views(spark, sf_dir, ("embeddings",))["embeddings"]


@pytest.fixture(scope="module")
def index_path(spark, embeddings, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ivf") / "index")
    build_ivf_index(embeddings, p)
    return p


def test_index_layout_partitioned(spark, index_path):
    import pathlib

    dirs = list(pathlib.Path(index_path).glob("cluster=*"))
    assert len(dirs) > 1, "expected cluster= partition directories"


def test_probe_matches_inmemory_ivf(spark, embeddings, index_path):
    q = query_vectors(embeddings, max_query_id=20)
    got = {
        (r.query_id, r.neighbor_id, r.rnk)
        for r in probe_ivf_index(spark, index_path, q, k=3).collect()
    }
    want = {
        (r.query_id, r.neighbor_id, r.rnk)
        for r in ivf_topk(embeddings, k=3, max_query_id=20).collect()
    }
    assert got == want


def test_multiprobe_recall_dominates_single_probe(spark, embeddings):
    from console_datagen_spark.operators.similarity import brute_force_topk

    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(embeddings, k=3, max_query_id=20).collect()
    }

    def recall(nprobe):
        got = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(
                embeddings, k=3, max_query_id=20, nprobe=nprobe
            ).collect()
        }
        return len(got & truth) / len(truth)

    r1, r2 = recall(1), recall(2)
    # probing more clusters can only widen the candidate set
    assert r2 >= r1
    assert r2 > 0.3  # and must find a usable fraction of true neighbors


def test_probe_prunes_partitions(spark, embeddings, index_path):
    q = query_vectors(embeddings, max_query_id=5)
    clusters = [r.cluster for r in q.select("cluster").distinct().collect()]
    probed = probe_ivf_index(
        spark, index_path, q, k=3, nprobe_clusters=clusters
    )
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the cluster IN (...) predicate must appear as a partition filter,
    # not a post-scan filter
    pf = plan[plan.find("PartitionFilters"):][:300]
    assert "cluster" in pf, pf


def test_enrich_stream_broadcast(spark, tmp_path):
    src = tmp_path / "src"
    (
        spark.createDataFrame(
            [(1, "click"), (2, "error"), (3, "view")], "id LONG, et STRING"
        )
        .coalesce(1)
        .write.parquet(str(src))
    )
    stream = spark.readStream.schema("id LONG, et STRING").parquet(str(src))
    dim = spark.createDataFrame(
        [("click", 1.0), ("error", 5.0)], "et STRING, weight DOUBLE"
    )
    out = enrich_stream(stream, dim, ["et"])
    emitted = []
    q = (
        out.writeStream.foreachBatch(lambda b, _: emitted.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "c"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {r.id: r.weight for r in emitted}
    assert got == {1: 1.0, 2: 5.0, 3: None}


def test_filter_known_duplicates(spark, tmp_path):
    src = tmp_path / "src2"
    (
        spark.createDataFrame(
            [(1, "seen before"), (2, "brand new")], "id LONG, text STRING"
        )
        .coalesce(1)
        .write.parquet(str(src))
    )
    stream = spark.readStream.schema("id LONG, text STRING").parquet(str(src))
    fps = spark.createDataFrame([("seen before",)], "t STRING").select(
        F.md5("t").alias("fp")
    )
    out = filter_known_duplicates(stream, fps)
    emitted = []
    q = (
        out.writeStream.foreachBatch(lambda b, _: emitted.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "c2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert [r.id for r in emitted] == [2]
    assert "fp" not in emitted[0].asDict()


# ---- persisted IVFPQ index (codes-only, partition-pruned ADC) --------------


@pytest.fixture(scope="module")
def ivfpq_path(spark, embeddings, tmp_path_factory):
    from console_datagen_spark.operators.ivf_index import build_ivfpq_index

    p = str(tmp_path_factory.mktemp("ivfpq") / "index")
    build_ivfpq_index(embeddings, p)
    return p


def test_ivfpq_index_is_codes_only(spark, ivfpq_path):
    import pathlib

    idx = spark.read.parquet(ivfpq_path)
    assert set(idx.columns) == {"vec_id", "codes", "cluster"}
    row = idx.limit(1).collect()[0]
    assert len(row.codes) == PQ_M  # PQ_M 6-bit codes, no raw vectors stored
    dirs = list(pathlib.Path(ivfpq_path).glob("cluster=*"))
    assert len(dirs) > 1


def test_ivfpq_probe_matches_inmemory(spark, embeddings, ivfpq_path):
    from console_datagen_spark.operators.ivf_index import probe_ivfpq_index
    from console_datagen_spark.operators.similarity import ivfpq_topk

    got = {
        (r.query_id, r.neighbor_id, r.rnk, r.adist)
        for r in probe_ivfpq_index(spark, ivfpq_path, embeddings).collect()
    }
    want = {
        (r.query_id, r.neighbor_id, r.rnk, r.adist)
        for r in ivfpq_topk(embeddings).collect()
    }
    assert got == want and len(want) > 0


def test_ivfpq_probe_prunes_partitions(spark, embeddings, ivfpq_path):
    """The probed scan must read only the probed clusters' partitions —
    PartitionFilters present in the physical plan."""
    from console_datagen_spark.operators.ivf_index import probe_ivfpq_index

    df = probe_ivfpq_index(spark, ivfpq_path, embeddings, max_query_id=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the partition filter actually constrains cluster (not an empty list)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cluster" in m.group(1)


def test_opq_permute_hash_exact_vs_oracle(spark, sf_dir):
    """pq_topk over an OPQ-permuted corpus must stay hash-exact: the
    DuckDB side replays the permutation by redefining the embeddings view
    with the same literal dim order, then runs the UNCHANGED sim_pq_topk
    oracle SQL."""
    import duckdb

    from console_datagen_spark.operators.similarity import opq_permute, pq_topk
    from console_datagen_spark.plans import all_queries
    from tests.test_oracle import normalize

    # fixed non-trivial permutation: reverse each 8-dim block
    perm = tuple(b * 8 + (7 - i) for b in range(8) for i in range(8))
    emb = register_views(spark, sf_dir, ("embeddings",))["embeddings"]
    got = normalize(pq_topk(opq_permute(emb, perm)).toPandas())

    idx = ", ".join(f"embedding[{p + 1}]" for p in perm)
    duck = duckdb.connect()
    duck.execute(
        "CREATE VIEW embeddings AS "
        f"SELECT vec_id, [{idx}] AS embedding, label "
        f"FROM read_parquet('{sf_dir}/embeddings.parquet')"
    )
    want = normalize(
        duck.execute(all_queries()["sim_pq_topk"].oracle).fetchdf()
    )
    assert len(got) == len(want) and len(got) > 0
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_incremental_append_matches_full_rebuild(spark, embeddings, tmp_path):
    """Index built as base+append must answer probes identically to an
    index built in one shot — fixed centroids make assignment stable."""
    base = embeddings.where("vec_id % 3 != 0")
    extra = embeddings.where("vec_id % 3 = 0")
    from console_datagen_spark.operators.ivf_index import append_to_ivf_index

    p_inc = str(tmp_path / "inc")
    build_ivf_index(base, p_inc, centroid_source=embeddings)
    # centroids come from the FULL corpus frame in both paths (vec_id%25
    # rows), so assignments agree between the two index generations
    append_to_ivf_index(extra, p_inc, centroid_source=embeddings)
    p_full = str(tmp_path / "full")
    build_ivf_index(embeddings, p_full)

    q = query_vectors(embeddings, max_query_id=20)
    got = {
        (r.query_id, r.neighbor_id, r.rnk)
        for r in probe_ivf_index(spark, p_inc, q, k=3).collect()
    }
    want = {
        (r.query_id, r.neighbor_id, r.rnk)
        for r in probe_ivf_index(spark, p_full, q, k=3).collect()
    }
    assert got == want


def test_ivfpq_incremental_append_matches_full_rebuild(spark, embeddings, tmp_path):
    from console_datagen_spark.operators.ivf_index import (
        append_to_ivfpq_index,
        build_ivfpq_index,
        probe_ivfpq_index,
    )

    base = embeddings.where("vec_id % 3 != 0")
    extra = embeddings.where("vec_id % 3 = 0")
    p_inc = str(tmp_path / "pq_inc")
    build_ivfpq_index(base, p_inc, centroid_source=embeddings)
    append_to_ivfpq_index(extra, p_inc, centroid_source=embeddings)
    p_full = str(tmp_path / "pq_full")
    build_ivfpq_index(embeddings, p_full)

    got = {
        tuple(r)
        for r in probe_ivfpq_index(spark, p_inc, embeddings, max_query_id=10).collect()
    }
    want = {
        tuple(r)
        for r in probe_ivfpq_index(spark, p_full, embeddings, max_query_id=10).collect()
    }
    assert got == want
