"""Fixed-point binary log (functions/intlog.py) + BM25 invariants.

The cross-engine hash identity of the registered BM25 queries is pinned
by test_oracle.py like every other query; these tests pin the pieces —
the log's accuracy/determinism contract and the BM25 score algebra —
so a regression names the layer, not just the query.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from console_datagen_spark.functions.intlog import (
    FRAC_BITS,
    log2_fp_ctes,
)


def _duck_log2_fp(pairs: list[tuple[int, int]]) -> list[int]:
    con = duckdb.connect()
    values = ", ".join(
        f"({i}, CAST({x} AS BIGINT), CAST({y} AS BIGINT))"
        for i, (x, y) in enumerate(pairs)
    )
    sql = (
        f"WITH args AS (SELECT * FROM (VALUES {values}) t(k, x, y)), "
        + log2_fp_ctes("args", "k", "x", "y", "duck")
        + " SELECT lg_fp FROM lg ORDER BY k"
    )
    try:
        return [r[0] for r in con.execute(sql).fetchall()]
    finally:
        con.close()


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10**12),
            st.integers(min_value=1, max_value=10**12),
        ).map(lambda p: (max(p), min(p))),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=40, deadline=None)
def test_log2_fp_accuracy(pairs):
    """Within 3 units of true log2 at 2^-FRAC_BITS-bit scale, never over."""
    got = _duck_log2_fp(pairs)
    for (x, y), fp in zip(pairs, got):
        true = math.log2(x / y) * (1 << FRAC_BITS)
        # truncation-only error: result <= true, within 3 units
        assert fp <= true + 1e-6, (x, y, fp, true)
        assert fp >= true - 3, (x, y, fp, true)


def test_log2_fp_exact_powers():
    """Exact powers of two have zero truncation error."""
    pairs = [(1 << e, 1) for e in range(0, 40, 3)] + [(48, 3), (1024, 16)]
    got = _duck_log2_fp(pairs)
    for (x, y), fp in zip(pairs, got):
        assert fp == int(math.log2(x // y)) * (1 << FRAC_BITS), (x, y, fp)


def test_log2_fp_monotone():
    """Larger ratios never get a smaller fixed-point log (ranking safety)."""
    pairs = [(n, 7) for n in range(7, 700, 13)]
    got = _duck_log2_fp(pairs)
    assert got == sorted(got)


def test_log2_fp_spark_duck_identical(spark):
    """Bit-identical values on both engines over an adversarial grid:
    power-of-two boundaries ±1 (where a last-ulp libm log differs most),
    equal args, and large co-prime ratios."""
    pairs = (
        [(1 << e, 1) for e in range(1, 20)]
        + [((1 << e) + 1, 1) for e in range(1, 20)]
        + [((1 << e) - 1, 1) for e in range(2, 20)]
        + [(7, 7), (999999937, 13), (2 * 10**9 + 2, 3), (60001, 29999)]
    )
    values = ", ".join(
        f"({i}, CAST({x} AS BIGINT), CAST({y} AS BIGINT))"
        for i, (x, y) in enumerate(pairs)
    )
    duck_sql = (
        f"WITH args AS (SELECT * FROM (VALUES {values}) t(k, x, y)), "
        + log2_fp_ctes("args", "k", "x", "y", "duck")
        + " SELECT k, lg_fp FROM lg ORDER BY k"
    )
    spark_sql = (
        f"WITH args AS (SELECT * FROM (VALUES {values}) t(k, x, y)), "
        + log2_fp_ctes("args", "k", "x", "y", "spark")
        + " SELECT k, lg_fp FROM lg ORDER BY k"
    )
    con = duckdb.connect()
    try:
        want = [tuple(r) for r in con.execute(duck_sql).fetchall()]
    finally:
        con.close()
    got = [tuple(r) for r in spark.sql(spark_sql).collect()]
    assert got == want


def test_bm25_term_headroom():
    """The per-term numerator stays far inside BIGINT for worst-case
    document-scale inputs (idf < 2^16, tf <= dl <= 10^5 tokens, avgdl
    up to 10^4 tokens => avgdl_milli 10^7): corpus SIZE never enters."""
    idf_fp_max = 64 * (1 << FRAC_BITS)  # e <= 63
    tf_max, avgdl_milli_max = 10**5, 10**7
    num = idf_fp_max * 44 * tf_max * avgdl_milli_max
    assert num < 2**63 - 1


def test_log2_fp_huge_args_exact():
    """Corpus-total-scale arguments (x >= 2^43, the old overflow cliff)
    are in-domain since r13: e >= 20 takes the exact identity path, so
    accuracy holds all the way to BIGINT max (ADVICE r12)."""
    pairs = [
        (1 << 43, 1),
        ((1 << 43) + 17, 1),
        (2 * 10**13, 1),  # ~100 TB corpus token total
        (2**62 - 3, 1),
        (2**62 - 3, 977),
        (2 * 10**13, 3 * 10**6),  # lg(U / c_w) shape
    ]
    got = _duck_log2_fp(pairs)
    for (x, y), fp in zip(pairs, got):
        true = math.log2(x / y) * (1 << FRAC_BITS)
        assert fp <= true + 1e-6, (x, y, fp, true)
        assert fp >= true - 3, (x, y, fp, true)


def test_log2_fp_huge_args_preshift_accuracy():
    """The e < 20 pre-shift regime (x and y both >= ~2^43): the shared
    downshift preserves the ratio to < 2^-41 relative, so the output is
    still within the normal 3-unit truncation envelope."""
    pairs = [
        (2**62 - 3, 2**61 + 11),  # e = 0
        (2**62 - 3, (2**62 - 3) // 5),  # e = 2
        (3 * 10**15 + 7, 10**13 + 1),  # e = 8
        (2**50 + 123, 2**44 + 9),  # e = 6, just past the old cliff
    ]
    got = _duck_log2_fp(pairs)
    for (x, y), fp in zip(pairs, got):
        true = math.log2(x / y) * (1 << FRAC_BITS)
        assert abs(fp - true) <= 3, (x, y, fp, true)


def test_log2_fp_huge_args_spark_duck_identical(spark):
    """Cross-engine bit-identity holds in the regimes the r12 advice
    flagged: x >= 2^43 previously wrapped in Spark and ERRORED in
    DuckDB; now both engines agree everywhere."""
    pairs = [
        (1 << 43, 1),
        (2 * 10**13, 1),
        (2**62 - 3, 1),
        (2**62 - 3, 2**61 + 11),
        (3 * 10**15 + 7, 10**13 + 1),
    ]
    values = ", ".join(
        f"({i}, CAST({x} AS BIGINT), CAST({y} AS BIGINT))"
        for i, (x, y) in enumerate(pairs)
    )
    duck_sql = (
        f"WITH args AS (SELECT * FROM (VALUES {values}) t(k, x, y)), "
        + log2_fp_ctes("args", "k", "x", "y", "duck")
        + " SELECT k, lg_fp FROM lg ORDER BY k"
    )
    spark_sql = (
        f"WITH args AS (SELECT * FROM (VALUES {values}) t(k, x, y)), "
        + log2_fp_ctes("args", "k", "x", "y", "spark")
        + " SELECT k, lg_fp FROM lg ORDER BY k"
    )
    con = duckdb.connect()
    try:
        want = [tuple(r) for r in con.execute(duck_sql).fetchall()]
    finally:
        con.close()
    got = [tuple(r) for r in spark.sql(spark_sql).collect()]
    assert got == want


@pytest.mark.parametrize(
    "bad,want",
    [
        # x=0: mantissa 0 clamps to S, e=0 -> lg_fp 0 (the lg of 1) —
        # degenerate but deterministic; x=0 never reaches the helper
        # in-repo (BM25's (2N+2, 2df+1) are always >= 1)
        ((0, 1), 0),
        # y=0: division by zero -> NULL in DuckDB, never a finite lie
        ((3, 0), None),
    ],
)
def test_log2_fp_domain(bad, want):
    """x, y >= 1 is the contract. ACTUALLY RUN the out-of-domain inputs
    and pin the observed failure mode, so any behavior change is caught
    (ADVICE r12: the old spelling never executed the SQL)."""
    got = _duck_log2_fp([bad])
    assert got == [want], (bad, got)
