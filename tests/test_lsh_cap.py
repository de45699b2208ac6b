"""Hot-bucket cap: capped LSH candidate generation stays O(cap²) per
bucket instead of quadratic in bucket size (the crawl-scale template-
family guard), and the dropped buckets surface as telemetry.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from console_datagen_spark.operators import dedup as D
from console_datagen_spark.operators.similarity import candidate_pairs_from_buckets


def _template_corpus(spark, n_family=1000):
    """A 1k-member identical-text template family plus two genuine
    near-dup pairs with distinct text (small buckets)."""
    fam = [(i, "the same boilerplate template text repeats here verbatim")
           for i in range(n_family)]
    near = [
        (2000, "alpha beta gamma delta epsilon zeta eta theta"),
        (2001, "alpha beta gamma delta epsilon zeta eta iota"),
        (3000, "one two three four five six seven eight nine"),
        (3001, "one two three four five six seven eight ten"),
    ]
    return spark.createDataFrame(fam + near, "doc_id long, text string")


def test_giant_bucket_is_dropped_not_paired(spark):
    docs = _template_corpus(spark)
    cand = D.lsh_candidate_pairs_capped(docs, bucket_cap=10)
    pairs = {(r.doc_a, r.doc_b) for r in cand.collect()}
    # the 1000-member family would yield ~499,500 pairs per band uncapped;
    # capped it contributes ZERO — only the small-bucket near-dups remain
    assert all(a >= 2000 for a, _ in pairs)
    assert (2000, 2001) in pairs and (3000, 3001) in pairs
    # candidate volume is O(cap²)-bounded, nowhere near the 1k² blowup
    assert cand.count() < 10 * 10


def test_dropped_bucket_telemetry(spark):
    docs = _template_corpus(spark)
    bands = D.minhash_bands(docs)
    over = D.lsh_oversized_buckets(bands, bucket_cap=10)
    rows = over.collect()
    # every band puts the identical family into one 1000-member bucket
    assert len(rows) == 4  # k=8, rows_per_band=2 -> 4 bands
    assert all(r.bsz == 1000 for r in rows)


def test_loose_cap_matches_uncapped(spark):
    """With a cap no bucket exceeds, capped == uncapped candidates."""
    docs = _template_corpus(spark, n_family=5)
    capped = D.lsh_candidate_pairs_capped(docs, bucket_cap=10**6)
    uncapped = D.lsh_candidate_pairs(docs)
    assert {tuple(r) for r in capped.collect()} == {
        tuple(r) for r in uncapped.collect()
    }


def test_sign_lsh_bucket_cap(spark):
    """The embedding-LSH twin: oversized (band, bucket) groups are dropped
    before pairing, small ones pair normally."""
    rows = [(i, 0, 7) for i in range(50)] + [(100, 0, 9), (101, 0, 9), (102, 0, 9)]
    buckets = spark.createDataFrame(rows, "vec_id long, band int, bucket long")
    capped = candidate_pairs_from_buckets(buckets, bucket_cap=5)
    got = {(r.vec_a, r.vec_b) for r in capped.collect()}
    assert got == {(100, 101), (100, 102), (101, 102)}
    # and None keeps the giant bucket (existing behavior unchanged)
    assert candidate_pairs_from_buckets(buckets).count() == 50 * 49 // 2 + 3


def test_sampled_bucket_keeps_a_family_core(spark):
    """Per-bucket sampling keeps cap members of the giant bucket, so a
    core of the template family still pairs (O(cap^2)), while the capped
    variant drops it entirely."""
    docs = _template_corpus(spark)
    cap = 5
    cand = D.lsh_candidate_pairs_sampled(docs, bucket_cap=cap)
    pairs = {(r.doc_a, r.doc_b) for r in cand.collect()}
    fam_pairs = {(a, b) for a, b in pairs if b < 2000}
    # the family core pairs completely within the sample: C(cap,2) per
    # band, identical sample across bands (same rank key) -> exactly
    # C(cap,2) distinct family pairs
    assert len(fam_pairs) == cap * (cap - 1) // 2
    # and the small-bucket near-dups survive untouched
    assert (2000, 2001) in pairs and (3000, 3001) in pairs
    # still nowhere near the 1k^2 blowup
    assert cand.count() < 2 * cap * cap


def test_sampled_loose_cap_matches_uncapped(spark):
    docs = _template_corpus(spark, n_family=5)
    sampled = D.lsh_candidate_pairs_sampled(docs, bucket_cap=10**6)
    uncapped = D.lsh_candidate_pairs(docs)
    assert {tuple(r) for r in sampled.collect()} == {
        tuple(r) for r in uncapped.collect()
    }
