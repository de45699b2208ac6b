"""Containment dedup: the asymmetric pair class Jaccard-banded LSH is
blind to (A a verbatim subset of a much larger B), plus the rare-shingle
candidate bound and the group-split leakage invariant.
"""

from __future__ import annotations

import pandas as pd
import pytest

from console_datagen_spark.plans import all_queries
from console_datagen_spark.plans.dedup import (
    _CONT_MAX_DF,
    _containment,
    _JACCARD_PERMILLE,
    _minhash_pairs,
)


def _quote_corpus(spark, tmpdir):
    """doc 1 = 60-token page; doc 2 = a verbatim 12-token quote of it.

    Jaccard(1,2) ~ 10/58 << the 350-permille verify gate, so the
    resemblance pipeline must NOT pair them; containment(2 in 1) = 1000
    permille, so the containment pipeline MUST. Filler docs keep the
    quoted shingles rare but above df=1.
    """
    page = " ".join(f"w{i:02d}" for i in range(60))
    quote = " ".join(f"w{i:02d}" for i in range(20, 32))
    other = [
        (10 + j, " ".join(f"x{j}t{i}" for i in range(30)), "en", "web", 1)
        for j in range(5)
    ]
    rows = [(1, page, "en", "web", len(page)), (2, quote, "en", "web", len(quote))]
    df = spark.createDataFrame(
        rows + other, "doc_id long, text string, lang string, source string, n_chars long"
    )
    path = str(tmpdir / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return str(tmpdir)


@pytest.fixture(scope="module")
def quote_dir(spark, tmp_path_factory):
    return _quote_corpus(spark, tmp_path_factory.mktemp("quote"))


def test_containment_catches_quote_inclusion(spark, quote_dir):
    pairs = {(r.doc_a, r.doc_b): r for r in _containment(spark, quote_dir).collect()}
    assert (1, 2) in pairs
    r = pairs[(1, 2)]
    # the quote is fully contained: every shingle of doc 2 is in doc 1
    assert r.cont_permille == 1000
    assert r.inter_sz == r.sz_b  # doc 2 is the small, contained side


def test_jaccard_pipeline_misses_the_same_pair(spark, quote_dir):
    jac = {(r.doc_a, r.doc_b) for r in _minhash_pairs(spark, quote_dir).collect()}
    # resemblance verify gate: 10 shared / 58 union ~ 172 permille < 350
    assert (1, 2) not in jac


def test_candidate_volume_is_df_bounded(spark, quote_dir):
    # no shingle joins more than _CONT_MAX_DF docs, so per-shingle pair
    # fanout is bounded by C(max_df, 2) — the no-all-pairs invariant
    out = _containment(spark, quote_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the registered oracle must block on the SAME df band the plan does
    spec = all_queries()["dedup_containment"]
    assert f"BETWEEN 2 AND {_CONT_MAX_DF}" in spec.oracle


def test_group_split_has_zero_leakage(spark, duck, sf_dir):
    spec = all_queries()["sample_group_split"]
    rows = spec.spark(spark, sf_dir).collect()
    assert rows, "split produced no rows"
    assert all(r.n_leaky_groups == 0 for r in rows)
    assert {r.split for r in rows} <= {"train", "val", "test"}
    # doc mass conserved across splits
    n_docs = pd.read_parquet(f"{sf_dir}/documents.parquet").shape[0]
    assert sum(r.n_docs for r in rows) == n_docs


def test_packed_verify_giant_doc_bound(spark, monkeypatch):
    """PACKED_VERIFY_MAX_IDS is a guarantee, not advice (r15): the packed
    frame rejects a doc whose id list exceeds the bound mid-job instead of
    silently producing an unsplittable multi-MB row."""
    import console_datagen_spark.operators.dedup as D

    ids = spark.createDataFrame(
        [(1, t) for t in range(5)] + [(2, 99)], "doc_id long, tid long"
    )
    ok = {r.doc_id: sorted(r._ts) for r in D.packed_doc_ids(ids).collect()}
    assert ok == {1: [0, 1, 2, 3, 4], 2: [99]}
    monkeypatch.setattr(D, "PACKED_VERIFY_MAX_IDS", 3)
    with pytest.raises(Exception, match="packed verify|PACKED|exceeds|shingle"):
        D.packed_doc_ids(ids).collect()
