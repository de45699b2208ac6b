"""Unit tests for incremental ingest dedup and SemDeDup semantic dedup.

The oracle suite (test_oracle.py) hash-certifies both against DuckDB; these
tests pin the operator-level contracts: flag semantics on a known tiny
corpus, index-reuse parity, and the SemDeDup recall relationship to the
exact all-pairs ground truth.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from console_datagen_spark.catalog import register_views
from console_datagen_spark.operators import dedup as D
from console_datagen_spark.operators import similarity as S


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return register_views(spark, sf_dir, ("embeddings",))["embeddings"]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_flags_known_corpus(spark):
    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "pack my box with five dozen liquor jugs right now"),
        ],
    )
    incoming = _docs(
        spark,
        [
            # near-copy of doc 1 (one token changed at the end)
            (11, "the quick brown fox jumps over the lazy dog tonight"),
            # unrelated content — must come back is_dup = 0
            (12, "completely unrelated words about distributed query engines"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in D.incremental_dedup(
            corpus, incoming, threshold_permille=350
        ).collect()
    }
    assert out[11]["is_dup"] == 1 and out[11]["match_id"] == 1
    assert out[11]["match_permille"] >= 350
    assert out[12]["is_dup"] == 0 and out[12]["match_id"] is None


def test_incremental_index_reuse_parity(spark, sf_dir):
    """Probing a precomputed (persisted-index shape) band frame gives the
    same answer as rebuilding the index from corpus text."""
    docs = register_views(spark, sf_dir, ("documents",))["documents"]
    corpus = docs.where("doc_id % 10 < 8")
    incoming = docs.where("doc_id % 10 >= 8").limit(40)
    fresh = D.incremental_dedup(corpus, incoming).orderBy("doc_id").collect()
    ids_c = D.doc_shingle_ids(corpus)
    index = D.minhash_bands(corpus, ids_df=ids_c).persist()
    try:
        reused = (
            D.incremental_dedup(
                corpus, incoming, corpus_bands=index, corpus_ids=ids_c
            )
            .orderBy("doc_id")
            .collect()
        )
    finally:
        index.unpersist()
    assert fresh == reused


def test_incremental_empty_batch(spark):
    corpus = _docs(spark, [(1, "some corpus document with enough tokens")])
    incoming = _docs(spark, []).where("1=0")
    assert D.incremental_dedup(corpus, incoming).count() == 0


def test_semantic_pairs_subset_of_exact(spark, embeddings):
    """SemDeDup pairs are exactly the same-cluster subset of the exact
    all-pairs ground truth at the same threshold — never a superset."""
    sem = {
        (r["vec_a"], r["vec_b"])
        for r in S.semantic_dup_pairs(embeddings, threshold=0.4).collect()
    }
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in S.embedding_dup_pairs(embeddings, threshold=0.4).collect()
    }
    assert sem <= exact
    # the cluster bound is the ONLY cut: every exact pair that lands in
    # one cluster must be found
    assigned = {
        r["vec_id"]: r["cluster"]
        for r in S.assign_clusters(embeddings).select("vec_id", "cluster").collect()
    }
    same_cluster_exact = {
        (a, b) for a, b in exact if assigned[a] == assigned[b]
    }
    assert sem == same_cluster_exact


def test_semantic_keeper_rule_drops_chain_tails(spark):
    """Greedy min-id rule: in a dup chain a<b<c the drop list is {b, c}."""
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.999, 0.01], 0),
        (2, [0.998, 0.02], 0),
        (3, [0.0, 1.0], 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    pairs = S.semantic_dup_pairs(emb, centroid_mod=4, threshold=0.9)
    drops = sorted(
        r["vec_id"]
        for r in pairs.select(F.col("vec_b").alias("vec_id")).distinct().collect()
    )
    assert drops == [1, 2]
