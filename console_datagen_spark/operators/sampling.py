"""Deterministic sampling & dataset splitting (north-star pipeline surface).

Training pipelines need samples and train/val/test splits that are
*stable*: the same row lands in the same split on every run, on any
cluster, regardless of partitioning — and reproducible by other engines
auditing the data. Random samplers (TABLESAMPLE, rand()) give none of
that. These operators key every decision on the portable md5-derived
hash of a stable id (functions/hashing.py), so:

- membership is a pure function of (id, salt) — replays, retries and
  repartitions can't move a row between splits;
- the DuckDB oracle reproduces the exact sample (declared queries
  ``sample_deterministic`` / ``sample_split``);
- sampling composes with pushdown: the predicate is a scan-level filter,
  no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.hashing import token_id

SPLIT_MOD = 1000


def hash_bucket(id_col: Column | str, salt: str = "v1") -> Column:
    """Stable bucket in [0, SPLIT_MOD) from a stable id + salt."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return token_id(F.concat(F.lit(salt + ":"), c.cast("string"))) % F.lit(
        SPLIT_MOD
    )


def deterministic_sample(
    df: DataFrame, id_col: str, permille: int, salt: str = "v1"
) -> DataFrame:
    """Keep ~permille/1000 of rows, stably."""
    return df.where(hash_bucket(id_col, salt) < permille)


def deterministic_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, int],
    salt: str = "v1",
) -> DataFrame:
    """Label every row with its split; weights are permille and must sum
    to SPLIT_MOD (e.g. {"train": 800, "val": 100, "test": 100})."""
    if sum(weights.values()) != SPLIT_MOD:
        raise ValueError(f"weights must sum to {SPLIT_MOD}: {weights}")
    bucket = hash_bucket(id_col, salt)
    expr = None
    lo = 0
    for name, w in weights.items():
        cond = (bucket >= lo) & (bucket < lo + w)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += w
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_cols: str | tuple[str, ...],
    permille: dict[str, int],
    default_permille: int = 0,
    salt: str = "v1",
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. downsample dominant languages).

    The keep decision is still a pure function of (id, salt) — a scan-level
    filter with no shuffle — but the threshold varies by stratum value, the
    standard shape for language/source rebalancing of a training corpus.
    ``permille`` maps the *first* stratum column's value to its rate.
    """
    if isinstance(stratum_cols, str):
        stratum_cols = (stratum_cols,)
    col = F.col(stratum_cols[0])
    rate: Column = F.lit(default_permille)
    for value, p in sorted(permille.items()):
        rate = F.when(col == value, F.lit(p)).otherwise(rate)
    return df.where(hash_bucket(id_col, salt) < rate)


def weighted_sample(
    df: DataFrame, id_col: str, weight_permille: Column | str, salt: str = "v1"
) -> DataFrame:
    """Keep each row with probability ``weight_permille/1000`` — the soft
    quality-weighted corpus sampling modern curation pipelines run
    (probability ∝ a per-row quality/score column rather than a hard
    filter). Still a pure function of (id, salt): the keep decision is
    ``hash_bucket(id) < weight``, so membership is partition-invariant,
    replay-stable and oracle-reproducible, and — like every sampler here —
    it is a scan-level predicate with no shuffle. Expected kept mass is
    Σw/1000 without any global pass over the data."""
    w = (
        F.col(weight_permille)
        if isinstance(weight_permille, str)
        else weight_permille
    )
    return df.where(hash_bucket(id_col, salt) < w)
