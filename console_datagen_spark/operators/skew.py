"""Skew-mitigation operators (100 TB design; SURVEY §4 scale notes).

AQE's skew-join splitting handles most shuffle skew automatically, but two
patterns still need explicit engineering at very large scale:

- **salted aggregation**: a groupBy on a key where one value holds a huge
  share of rows bottlenecks the final reducer. Decomposable aggregates
  (count/sum/min/max) split into groupBy(key, salt) partial → groupBy(key)
  final, spreading the hot key over ``salt_buckets`` reducers.
- **salted join**: joining a skewed fact key against a small-but-not-
  broadcastable dim: salt the fact side, replicate the dim side across all
  salt values, join on (key, salt).

Salt derives from ``monotonically_increasing_id`` — distribution quality,
not determinism, is what matters here; results are exactly equal to the
unsalted plan (verified in tests/test_skew.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SALT_COL = "__salt"


def _with_salt(df: DataFrame, buckets: int) -> DataFrame:
    return df.withColumn(
        SALT_COL, F.pmod(F.monotonically_increasing_id(), F.lit(buckets)).cast("int")
    )


def salted_count(
    df: DataFrame, keys: list[str], salt_buckets: int = 16
) -> DataFrame:
    """Exact groupBy(keys).count() resilient to a hot key."""
    partial = (
        _with_salt(df, salt_buckets)
        .groupBy(*keys, SALT_COL)
        .agg(F.count("*").alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias("count"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sums: list[str] = (),
    mins: list[str] = (),
    maxs: list[str] = (),
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase decomposable aggregation (sum/min/max + count)."""
    partial_aggs = [F.count("*").alias("_cnt")]
    partial_aggs += [F.sum(c).alias(f"_sum_{c}") for c in sums]
    partial_aggs += [F.min(c).alias(f"_min_{c}") for c in mins]
    partial_aggs += [F.max(c).alias(f"_max_{c}") for c in maxs]
    partial = (
        _with_salt(df, salt_buckets).groupBy(*keys, SALT_COL).agg(*partial_aggs)
    )
    final_aggs = [F.sum("_cnt").alias("count")]
    final_aggs += [F.sum(f"_sum_{c}").alias(f"sum_{c}") for c in sums]
    final_aggs += [F.min(f"_min_{c}").alias(f"min_{c}") for c in mins]
    final_aggs += [F.max(f"_max_{c}").alias(f"max_{c}") for c in maxs]
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join with the fact side salted and the dim side replicated.

    Use when the dim side exceeds the broadcast threshold but a handful of
    fact keys dominate the shuffle. Cost: dim is duplicated salt_buckets
    times — keep buckets modest.

    Only fact-preserving join types are valid: with right/full outer
    joins every unmatched replicated dim row would survive once per salt
    value, yielding salt_buckets duplicates.
    """
    if how not in ("inner", "left", "leftouter", "left_outer",
                   "semi", "left_semi", "leftsemi",
                   "anti", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports inner/left/semi/anti joins, not {how!r}: "
            "replicated dim rows would duplicate right/full outer output"
        )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(salt_buckets - 1))
    ).alias(SALT_COL)
    dim_rep = dim.select("*", salts)
    fact_s = _with_salt(fact, salt_buckets)
    out = fact_s.join(dim_rep, [*on, SALT_COL], how)
    return out.drop(SALT_COL)
