"""DuckDB-oracle golden tests for every declared query (SURVEY §5.2.1).

Mirrors the driver's correctness gate: run the Spark callable and the
DuckDB oracle over the same parquet, normalize (columns sorted by name,
rows sorted by all columns, NULL literal, decimals at fixed scale), and
compare cell-by-cell. Exact equality for everything except float columns
(tolerance 1e-5 per FIXTURES.md — none of the declared queries emit
floats today, but the normalizer supports them).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from console_datagen_spark.plans import all_queries

ORACLE_SPECS = [
    (name, spec) for name, spec in sorted(all_queries().items()) if spec.oracle
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        # DuckDB's fetchdf() degrades DECIMAL→float64 and DATE→datetime64,
        # so fold both sides to rounded floats / full timestamps.
        if type(v).__name__ == "Decimal":
            return round(float(v), 5)
        if isinstance(v, float):
            return round(v, 5)
        if hasattr(v, "isoformat"):
            return pd.Timestamp(v).isoformat()
        return v

    for c in df.columns:
        df[c] = df[c].map(cell)
    return df.sort_values(by=list(df.columns), key=lambda s: s.astype(str)).reset_index(
        drop=True
    )


@pytest.mark.parametrize("name,spec", ORACLE_SPECS, ids=[n for n, _ in ORACLE_SPECS])
def test_oracle_match(name, spec, spark, duck, sf_dir):
    got = normalize(spec.spark(spark, sf_dir).toPandas())
    want = normalize(duck.execute(spec.oracle).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, obj=name)


def strict_canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-faithful canonicalization: unlike ``normalize`` above, Decimal
    and float cells are NOT folded together — ``Decimal('284019.50')`` and
    ``284019.5`` stringify (and therefore hash) differently, which is exactly
    the failure mode CORRECTNESS_r01 exposed. Dates/timestamps are folded to
    isoformat (the driver's check passes date-emitting queries, so its
    canonicalizer does normalize those)."""
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if hasattr(v, "isoformat"):
            return pd.Timestamp(v).isoformat()
        return str(v)

    for c in df.columns:
        df[c] = df[c].map(cell)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name,spec", ORACLE_SPECS, ids=[n for n, _ in ORACLE_SPECS])
def test_oracle_strict_hash(name, spec, spark, duck, sf_dir):
    """Cell-for-cell string equality — the value-hash the driver computes."""
    got = strict_canon(spec.spark(spark, sf_dir).toPandas())
    want = strict_canon(duck.execute(spec.oracle).fetchdf())
    pd.testing.assert_frame_equal(got, want, check_dtype=False, obj=name)


def test_every_query_has_total_order():
    # D1: multi-row queries must carry a total ORDER BY; global aggregates
    # (no GROUP BY → exactly one row) are exempt.
    for name, spec in all_queries().items():
        if spec.oracle:
            sql = spec.oracle.upper()
            assert "ORDER BY" in sql or "GROUP BY" not in sql, name
