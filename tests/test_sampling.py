"""Deterministic sampling/splitting: stability, coverage, stratification."""

import pytest
from pyspark.sql import functions as F

from console_datagen_spark.catalog import register_views
from console_datagen_spark.operators.sampling import (
    deterministic_sample,
    deterministic_split,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return register_views(spark, sf_dir, ("documents",))["documents"]


def test_sample_stable_and_partition_invariant(docs):
    a = sorted(r.doc_id for r in deterministic_sample(docs, "doc_id", 200).collect())
    b = sorted(
        r.doc_id
        for r in deterministic_sample(docs.repartition(13), "doc_id", 200).collect()
    )
    assert a == b
    n = docs.count()
    assert 0.1 * n < len(a) < 0.3 * n  # ~20%


def test_sample_monotone_in_rate(docs):
    s10 = {r.doc_id for r in deterministic_sample(docs, "doc_id", 100).collect()}
    s20 = {r.doc_id for r in deterministic_sample(docs, "doc_id", 200).collect()}
    assert s10 <= s20  # growing the rate only adds rows — stable expansion


def test_split_partitions_everything_once(docs):
    out = deterministic_split(
        docs, "doc_id", {"train": 800, "val": 100, "test": 100}
    )
    counts = {r.split: r.n for r in out.groupBy("split").agg(
        F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()
    assert counts["train"] > counts["val"]


def test_split_rejects_bad_weights(docs):
    with pytest.raises(ValueError, match="must sum"):
        deterministic_split(docs, "doc_id", {"a": 500, "b": 100})


def test_split_disjoint_from_salt_change(docs):
    a = {
        (r.doc_id, r.split)
        for r in deterministic_split(
            docs, "doc_id", {"train": 800, "val": 100, "test": 100}, salt="v1"
        ).collect()
    }
    b = {
        (r.doc_id, r.split)
        for r in deterministic_split(
            docs, "doc_id", {"train": 800, "val": 100, "test": 100}, salt="v2"
        ).collect()
    }
    assert a != b  # a new salt reshuffles membership...
    assert {x[0] for x in a} == {x[0] for x in b}  # ...but covers all rows


def test_stratified_rates(docs):
    out = stratified_sample(
        docs, "doc_id", "lang", {"en": 100, "zh": 1000}, default_permille=0
    )
    got = {r.lang: r.n for r in out.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    by_lang = {r.lang: r.n for r in docs.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    assert got.get("zh") == by_lang["zh"]  # 100% stratum kept whole
    assert 0 < got.get("en", 0) < by_lang["en"] * 0.25  # ~10% stratum
    assert set(got) <= {"en", "zh"}  # default 0 drops the rest
