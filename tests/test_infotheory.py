"""Synthetic-fixture regression tests for the log-domain tier.

The oracle gate (test_oracle.py) pins Spark == DuckDB on the shared
fixtures, but a bug both engines agree on is invisible to it — exactly
what happened to dq_kl_split_drift in r12 (ADVICE: the vals CTE only
contained counts that OCCURRED, so lg(1) was absent unless some train
count happened to equal 1, and the inner join then silently dropped
every train-only word — the largest-divergence terms — from the KL sum;
a corpus with all counts >= 2 yielded a NEGATIVE "KL"). These tests
build corpora where the dropped-term regime is forced and check the
value against an independent float computation of the same quantity.
"""

from __future__ import annotations

import math
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from console_datagen_spark.functions.hashing import bucket_sql_duck
from console_datagen_spark.functions.intlog import FRAC_BITS
from console_datagen_spark.plans import get_query


def _bucket(doc_id: int) -> int:
    con = duckdb.connect()
    try:
        expr = bucket_sql_duck(str(doc_id), "kl1", 10)
        return con.execute(f"SELECT {expr}").fetchone()[0]
    finally:
        con.close()


def _kl_float(train_tf: dict[str, int], val_tf: dict[str, int]) -> float:
    """KL(train || add-1-smoothed val) in bits — the query's definition,
    computed independently in float."""
    u = sum(train_tf.values())
    v = sum(val_tf.values())
    s = len(train_tf)  # smoothing mass = train vocab size
    out = 0.0
    for w, c in train_tf.items():
        p = c / u
        q = (val_tf.get(w, 0) + 1) / (v + s)
        out += p * math.log2(p / q)
    return out


@pytest.fixture(scope="module")
def kl_fixture(tmp_path_factory):
    """documents.parquet where ALL train token counts are >= 2 and one
    word is train-only: the exact corpus shape the r12 bug silently
    mis-scored. Bucket membership is resolved via the real hash so the
    fixture stays valid if doc ids change."""
    train_ids = [i for i in range(40) if _bucket(i) < 8][:3]
    val_ids = [i for i in range(40) if _bucket(i) >= 8][:2]
    assert len(train_ids) == 3 and len(val_ids) == 2
    rows = []
    for i in train_ids:
        # "trainonly" never appears in val; every train count >= 2
        rows.append((i, "base base base both both trainonly trainonly", "en"))
    for i in val_ids:
        rows.append((i, "base base base both both valword", "en"))
    d = tmp_path_factory.mktemp("kl_sf")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": [r[1] for r in rows],
                "lang": [r[2] for r in rows],
            }
        ),
        os.path.join(str(d), "documents.parquet"),
    )
    train_tf: dict[str, int] = {}
    val_tf: dict[str, int] = {}
    for i, text, _ in rows:
        tgt = train_tf if i in train_ids else val_tf
        for w in text.split(" "):
            tgt[w] = tgt.get(w, 0) + 1
    return str(d), train_tf, val_tf


def test_kl_split_drift_keeps_train_only_words(spark, kl_fixture):
    """Spark result ~= the independent float KL, and is nonnegative
    (KL against a subnormalized smoothed q is provably >= 0 — the r12
    bug produced large NEGATIVE values on this corpus shape)."""
    sf_dir, train_tf, val_tf = kl_fixture
    rows = get_query("dq_kl_split_drift").spark(spark, sf_dir).collect()
    assert len(rows) == 1 and rows[0]["lang"] == "en"
    got_bits = rows[0]["kl_fp"] / (1 << FRAC_BITS)
    want_bits = _kl_float(train_tf, val_tf)
    assert rows[0]["kl_fp"] >= 0, rows[0]
    assert abs(got_bits - want_bits) < 0.05, (got_bits, want_bits)
    assert rows[0]["n_train_tokens"] == sum(train_tf.values())


def test_kl_split_drift_oracle_agrees_on_fixture(spark, kl_fixture):
    """Cross-engine identity on the regression corpus itself (the shared
    sf fixtures may or may not exercise the train-only path)."""
    sf_dir, _, _ = kl_fixture
    spec = get_query("dq_kl_split_drift")
    got = [tuple(r) for r in spec.spark(spark, sf_dir).collect()]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        )
        want = [tuple(r) for r in con.execute(spec.oracle).fetchall()]
    finally:
        con.close()
    assert got == want
