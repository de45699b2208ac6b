"""Portable deterministic hashing.

The dedup operators need a string→int64 hash that DuckDB can reproduce
exactly (so the oracle is hash-checkable, not rows-only). ``xxhash64`` /
``hash`` differ between engines; md5 is bit-identical everywhere, so we
take the first 15 hex digits (60 bits, always positive in int64):

    Spark : CAST(conv(substr(md5(s),1,15),16,10) AS BIGINT)
    DuckDB: ('0x' || substr(md5(s),1,15))::BIGINT

MinHash permutations are universal hashes h_i(x) = (a_i*x + b_i) mod P over
x = token_id mod P with P = 1e9+7; coefficients are a deterministic pure
function of the permutation index so both engines can re-derive them.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

HASH_PRIME = 1_000_000_007


def token_id(col: Column | str) -> Column:
    """60-bit md5-prefix hash of a string column (portable to DuckDB)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def token_id_sql_spark(expr: str) -> str:
    return f"CAST(conv(substr(md5({expr}),1,15),16,10) AS BIGINT)"


def token_id_sql_duck(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}),1,15))::BIGINT)"


def minhash_coeffs(k: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) for k MinHash permutations."""
    return [(2 * i + 3, (i * i * 31 + 7) % HASH_PRIME) for i in range(k)]


def bucket_sql_spark(key_expr: str, seed: str = "v1", mod: int = 1000) -> str:
    """Stable permille hash bucket of a key column (Spark spelling) —
    the canonical train/val/test and sampling split idiom. Must stay
    value-identical to :func:`bucket_sql_duck` for every (seed, mod)."""
    return (
        f"(CAST(conv(substr(md5(concat('{seed}:', "
        f"CAST({key_expr} AS STRING))),1,15),16,10) AS BIGINT) % {mod})"
    )


def bucket_sql_duck(key_expr: str, seed: str = "v1", mod: int = 1000) -> str:
    """DuckDB spelling of :func:`bucket_sql_spark`."""
    return (
        f"(('0x' || substr(md5(concat('{seed}:', "
        f"CAST({key_expr} AS VARCHAR))),1,15))::BIGINT % {mod})"
    )
