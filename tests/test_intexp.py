"""Accuracy + cross-engine pins for the fixed-point exp2 chain."""

from __future__ import annotations

import math

import duckdb
import pytest

from console_datagen_spark.functions.intexp import exp2_fp_ctes
from console_datagen_spark.functions.intlog import (
    FRAC_BITS,
    MANT_SCALE,
    log2_fp_ctes,
)
from console_datagen_spark.plans import get_query

S = MANT_SCALE
ONE = 1 << FRAC_BITS


def _duck_exp2(xs: list[int]) -> dict[int, int]:
    con = duckdb.connect()
    try:
        vals = ",".join(f"({x})" for x in xs)
        rows = con.execute(
            f"WITH src(x) AS (VALUES {vals}), "
            + exp2_fp_ctes("src", "x", "x", "duck", out="ex")
            + " SELECT x, ex_fp FROM ex"
        ).fetchall()
    finally:
        con.close()
    return dict(rows)


def test_exp2_accuracy_sweep():
    """ex_fp/S within 2^-14 relative of true 2^(x/1024) across the
    domain, including every single-bit fraction (the constants
    themselves) and dense low-exponent coverage."""
    xs = sorted(
        {0, 1, ONE - 1, ONE, ONE + 1, 42 * ONE}
        | {1 << j for j in range(FRAC_BITS)}
        | {i * 37 for i in range(0, 1100)}
        | {5 * ONE + i for i in range(0, ONE, 61)}
    )
    got = _duck_exp2(xs)
    for x in xs:
        ref = 2.0 ** (x / ONE) * S
        assert abs(got[x] - ref) <= ref * 2**-14, (x, got[x], ref)


def test_exp2_monotone_nondecreasing():
    xs = list(range(0, 4 * ONE, 7))
    got = _duck_exp2(xs)
    vals = [got[x] for x in xs]
    assert vals == sorted(vals)


def test_log_exp_roundtrip():
    """exp2(log2(n)) returns n within 2.5e-3 relative: intlog's
    documented bound is < 3 units of 2^-10 bits (~2e-3 relative after
    exponentiation, floor-biased low), exp2 adds < 2^-14 — the chains'
    deterministic errors compound within spec."""
    ns = [1, 2, 3, 7, 10, 97, 1000, 12345, 10**6, 10**9, 10**12]
    con = duckdb.connect()
    try:
        vals = ",".join(f"({n})" for n in ns)
        rows = con.execute(
            f"WITH src(n) AS (VALUES {vals}), "
            + log2_fp_ctes("src", "n", "n", "1", "duck", out="lg")
            + ", "
            + exp2_fp_ctes("lg", "n", "lg_fp", "duck", out="ex")
            + " SELECT n, ex_fp FROM ex"
        ).fetchall()
    finally:
        con.close()
    for n, ex in rows:
        assert abs(ex - n * S) <= max(n * S * 2.5e-3, 2), (n, ex)
        # floor-biased: the chain never overshoots past exp2's own error
        assert ex <= n * S * (1 + 2**-14), (n, ex)


def test_exp2_spark_duck_bit_identical(spark):
    """The certification property itself: both engines produce the
    IDENTICAL integers over a mixed sweep."""
    xs = sorted({i * 137 for i in range(200)} | {1 << j for j in range(FRAC_BITS)})
    want = _duck_exp2(xs)
    vals = ",".join(f"({x})" for x in xs)
    rows = spark.sql(
        f"WITH src AS (SELECT * FROM VALUES {vals} AS t(x)), "
        + exp2_fp_ctes("src", "x", "x", "spark", out="ex")
        + " SELECT x, ex_fp FROM ex"
    ).collect()
    assert len(rows) == len(xs)
    for r in rows:
        assert want[r["x"]] == r["ex_fp"], r


def test_alpha_mix_matches_float_law(duck):
    """pipeline_alpha_mix's sampled shares match the float n^0.3 law to
    within the chain's documented error, and shares sum to ~1e6 ppm."""
    rows = duck.execute(get_query("pipeline_alpha_mix").oracle).fetchall()
    assert rows
    wsum = sum(n**0.3 for _, n, _, _, _ in rows)
    for _lang, n_tokens, weight_fp, raw_ppm, sample_ppm in rows:
        ref = n_tokens**0.3
        assert abs(weight_fp / S - ref) <= ref * 1e-3
        assert abs(sample_ppm - ref / wsum * 1_000_000) <= 1_500
    total = sum(r[4] for r in rows)
    assert 1_000_000 - len(rows) <= total <= 1_000_000
