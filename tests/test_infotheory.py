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


def test_kneser_ney_per_context_probabilities_sum_to_one():
    """KN is a proper distribution: for each context v, the rational
    P_KN(w|v) = max(4c-3,0)/(4cv) + (3/4)(N1v/cv)(N1w/Nt) summed over
    the FULL vocabulary (unseen w contribute only the continuation
    term) equals EXACTLY 1 — the discount mass 3*N1v/(4cv) removed from
    seen bigrams is redistributed by the continuation distribution,
    whose N1w sum over all w is Nt by definition. Verified in
    fractions.Fraction from DuckDB counts at sf0.001 (no floats), along
    with the query's single-rational spelling agreeing term-for-term on
    seen pairs."""
    from fractions import Fraction

    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/documents.parquet')"
        )
        rows = con.execute(
            "WITH pairs AS (SELECT p.v AS v, p.w AS w FROM ("
            "  SELECT unnest(list_transform(generate_series(1, len(l)-1), "
            "  i -> {'v': l[i], 'w': l[i+1]})) AS p "
            "  FROM (SELECT string_split(text, ' ') AS l FROM documents) d "
            "  WHERE len(l) >= 2) b), "
            "c2 AS (SELECT v, w, COUNT(*) AS c FROM pairs GROUP BY v, w) "
            "SELECT v, w, c FROM c2"
        ).fetchall()
    finally:
        con.close()
    c2 = {(v, w): c for v, w, c in rows}
    cv: dict[str, int] = {}
    n1v: dict[str, int] = {}
    n1w: dict[str, int] = {}
    for (v, w), c in c2.items():
        cv[v] = cv.get(v, 0) + c
        n1v[v] = n1v.get(v, 0) + 1
        n1w[w] = n1w.get(w, 0) + 1
    nt = len(c2)
    vocab_w = set(n1w)
    d = Fraction(3, 4)
    # check the three highest-fanout contexts (the expensive ones)
    for v in sorted(n1v, key=n1v.get, reverse=True)[:3]:
        seen = {w for (vv, w) in c2 if vv == v}
        total = Fraction(0)
        for w in vocab_w:
            c = c2.get((v, w), 0)
            p = (
                Fraction(max(c * 4 - 3, 0), 4 * cv[v])
                + d * Fraction(n1v[v], cv[v]) * Fraction(n1w[w], nt)
            )
            total += p
            if w in seen:
                # and the query's single-rational spelling agrees exactly
                num = max(4 * c - 3, 0) * nt + 3 * n1v[v] * n1w[w]
                den = 4 * cv[v] * nt
                assert p == Fraction(num, den)
        assert total == 1, (v, total)
