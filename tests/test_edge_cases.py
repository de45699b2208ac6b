"""Edge-case robustness: short/empty docs, empty frames, null handling."""

import pytest
from pyspark.sql import functions as F

from console_datagen_spark.operators import dedup as D
from console_datagen_spark.operators.similarity import brute_force_topk, with_norm
from console_datagen_spark.sources.generator import generate_batch


@pytest.fixture()
def tiny_docs(spark):
    return spark.createDataFrame(
        [
            (0, "one two three four", "en", "s", 18),
            (1, "ab", "en", "s", 2),  # < 3 tokens: must be excluded, not crash
            (2, "", "en", "s", 0),  # empty text
            (3, "one two three four", "en", "s", 18),  # exact dup of 0
        ],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )


def test_shingles_skip_short_docs(spark, tiny_docs):
    sh = D.doc_shingles(tiny_docs)
    docs_with_shingles = {r.doc_id for r in sh.select("doc_id").distinct().collect()}
    assert docs_with_shingles == {0, 3}


def test_exact_dedup_finds_duplicate_group(spark, tiny_docs):
    groups = {r.keeper: r.n for r in D.exact_dedup_groups(tiny_docs).collect()}
    assert groups[0] == 2  # docs 0 and 3 identical
    assert groups[1] == 1


def test_jaccard_identical_docs_1000_permille(spark, tiny_docs):
    pairs = D.ngram_jaccard_pairs(tiny_docs, threshold_permille=900).collect()
    assert [(r.doc_a, r.doc_b, r.jaccard_permille) for r in pairs] == [(0, 3, 1000)]


def test_minhash_on_degenerate_corpus(spark, tiny_docs):
    sigs = D.minhash_signatures(tiny_docs, k=4)
    rows = sigs.collect()
    assert {r.doc_id for r in rows} == {0, 3}
    assert len(rows) == 8  # 2 docs x 4 perms
    # identical docs → identical signatures
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.perm] = r.minhash
    assert by_doc[0] == by_doc[3]


def test_empty_documents_frame(spark):
    empty = spark.createDataFrame(
        [], "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    assert D.ngram_jaccard_pairs(empty).count() == 0
    assert D.exact_dedup_groups(empty).count() == 0


def test_topk_with_fewer_candidates_than_k(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    out = brute_force_topk(emb, k=10, max_query_id=1).collect()
    # only 2 candidates exist; k=10 must not fabricate rows
    assert len(out) == 2


def test_generate_zero_records(spark):
    assert generate_batch(spark, 0).count() == 0


def test_norm_of_zero_vector_no_crash(spark):
    emb = spark.createDataFrame(
        [(0, [0.0, 0.0])], "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    row = with_norm(emb).first()
    assert row.nrm == 0.0  # division guards are the caller's concern


# ---- training-prep tier (chunking / packing / bloom / PQ) ------------------


def test_chunking_single_and_empty_docs(spark, tiny_docs):
    """Docs shorter than one window yield exactly one chunk covering all
    tokens; empty text still yields one (empty-ish) chunk — never zero
    rows per doc, never a crash. Runs the registered query's Spark SQL
    text against an in-memory documents view."""
    import console_datagen_spark.plans.chunking as C

    tiny_docs.createOrReplaceTempView("documents")
    out = spark.sql(C._CHUNK_SPARK).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert set(per_doc) == {0, 1, 2, 3}
    for doc_id, rows in per_doc.items():
        assert len(rows) == 1  # all tiny docs fit one 64-token window
        assert rows[0].chunk_id == 0


def test_chunk_count_law():
    """n_chunks = 1 if n <= W else ceil((n-W)/S) + 1 covers every token
    exactly: last chunk's window reaches position >= n."""
    import math

    W, S = 64, 48
    for n in [1, 63, 64, 65, 111, 112, 113, 160, 161, 1000, 5000]:
        k = 1 if n <= W else math.ceil((n - W) / S) + 1
        last_start = (k - 1) * S + 1
        assert last_start + W - 1 >= n, n  # full coverage
        if k > 1:
            # one fewer chunk would leave a tail uncovered
            assert (k - 2) * S + W < n, n


def test_bloom_prefilter_no_false_negatives_column(spark, sf_dir):
    from console_datagen_spark.plans import all_queries

    out = all_queries()["dedup_bloom_prefilter"].spark(spark, sf_dir)
    bad = out.where(F.col("no_false_neg") == 0).count()
    assert bad == 0  # by construction: every exact hit is a bloom hit


def test_pq_topk_is_plausible_ann(spark, sf_dir):
    """PQ ranks must overlap the exact brute-force top-k far above chance
    (sanity that the ADC distance isn't garbage)."""
    from console_datagen_spark.catalog import register_views
    from console_datagen_spark.operators.similarity import pq_topk

    emb = register_views(spark, sf_dir, ("embeddings",))["embeddings"]
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, k=20, max_query_id=10).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in pq_topk(emb, k=5, max_query_id=10).collect()
    }
    # each query contributes 5 approx pairs; require >= 20% land in the
    # exact top-20 (chance level is ~20/4000 = 0.5%)
    overlap = len(exact & approx) / max(len(approx), 1)
    assert overlap >= 0.2, overlap


# ---- round-5 session-2 operators ------------------------------------------


def test_incremental_dedup_empty_corpus(spark):
    from console_datagen_spark.operators.dedup import incremental_dedup

    corpus = spark.createDataFrame([], "doc_id long, text string")
    incoming = spark.createDataFrame(
        [(1, "some incoming document with enough tokens here")],
        "doc_id long, text string",
    )
    out = incremental_dedup(corpus, incoming).collect()
    assert len(out) == 1 and out[0]["is_dup"] == 0


def test_bpe_short_and_empty_words(spark):
    from console_datagen_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [(1, "a b ab  x")], "doc_id long, text string"  # double space -> '' token
    )
    merges = bpe_train(docs, rounds=3)
    # only 'ab' has an adjacent pair; rounds stop when pairs dry up
    assert merges[0][1:3] == ("a", "b")
    assert len(merges) == 1


def test_heavy_hitters_k1(spark):
    from console_datagen_spark.operators.heavy_hitters import (
        mg_merge,
        mg_partition_summaries,
    )

    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 2, "key string"
    ).coalesce(1)
    got = mg_merge(mg_partition_summaries(df, "key", 1), 1).collect()
    assert len(got) <= 1
    if got:
        assert got[0]["key"] == "a"


def test_semantic_pairs_single_vector_cluster(spark):
    from console_datagen_spark.operators.similarity import semantic_dup_pairs

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.0, 1.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    # two orthogonal vectors, centroid_mod 1 -> each its own cluster at
    # best; no pair may appear
    assert semantic_dup_pairs(emb, centroid_mod=1, threshold=0.9).count() == 0
