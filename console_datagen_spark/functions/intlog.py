"""Exact-integer fixed-point binary logarithm, dual-dialect SQL.

Rankers that need a logarithm (BM25 idf, entropy weights) cannot use the
engines' ``LN``/``LOG2``: those delegate to the platform libm (JVM
``Math.log`` vs DuckDB's C ``log``), whose last-ulp rounding is not
guaranteed to agree, so a quantized score can flip an integer boundary
on one engine and break the hash-exact oracle contract. This module
emits the classic digit-by-digit binary-log instead — **pure BIGINT
arithmetic**, so Spark and DuckDB compute bit-identical values:

  log2(x/y) for integers x >= y >= 1 splits into
    e    = floor(log2(x DIV y))        -- bit length, exact
    frac = digits of log2(m), m = (x<<S) DIV (y<<e) in [S, 2S)
  and each fractional bit falls out of one squaring step
    m' = m*m DIV S;  bit = [m' >= 2S];  m = m' DIV (1+bit)
  (Knuth TAOCP vol 2 / the CORDIC-free schoolbook method).

The per-step ``DIV S`` truncation loses < 2^-19 of mantissa per round;
over 10 rounds the result is within 3 units of the true value at scale
2^-10 bits — a DETERMINISTIC spec, identical on both engines, which is
what the oracle gate needs (absolute accuracy only has to be good
enough for ranking, and 1/1024-bit resolution is far below any idf
gap BM25 cares about).

Bit-length is spelled ``LENGTH(bin(n)) - 1``: ``bin`` exists with
identical semantics in Spark and DuckDB, and floor(log2(x/y)) ==
floor(log2(x DIV y)) for x >= y (integer floor cannot cross a power of
two from inside [2^e, 2^(e+1))).

Scale shape: the chain is O(FRAC_BITS) chained CTEs over the frame of
DISTINCT argument pairs — for BM25 that is the distinct document
frequencies, a frame orders of magnitude smaller than the corpus that
Catalyst broadcasts into the scoring join.
"""

from __future__ import annotations

MANT_SCALE = 1 << 20  # mantissa fixed-point scale S; m*m <= 2^42 in BIGINT
FRAC_BITS = 10  # output scale: units of 2^-10 bits


def _shl1(e_expr: str, dialect: str) -> str:
    """1 << e as BIGINT in either dialect."""
    if dialect == "spark":
        return f"shiftleft(CAST(1 AS BIGINT), CAST({e_expr} AS INT))"
    return f"(CAST(1 AS BIGINT) << CAST({e_expr} AS INT))"


def log2_fp_ctes(
    src: str,
    key: str,
    x: str,
    y: str,
    dialect: str,
    out: str = "lg",
    frac_bits: int = FRAC_BITS,
) -> str:
    """CTE-chain text computing ``lg_fp ~= 2^frac_bits * log2(x/y)``.

    ``src`` is an existing CTE/table with one row per distinct argument,
    ``key`` its key column, ``x``/``y`` integer expressions with
    x >= y >= 1. Returns ``"name AS (...), ..."`` text (no leading WITH,
    no trailing comma) whose final CTE ``out`` exposes (key, lg_fp).
    Splice into a WITH list after ``src``.
    """
    idiv = "DIV" if dialect == "spark" else "//"
    s = MANT_SCALE
    parts = [
        # integer part + exact mantissa in [S, 2S)
        f"{out}_l0 AS (SELECT {key}, CAST({x} AS BIGINT) AS x, "
        f"CAST({y} AS BIGINT) AS y FROM {src})",
        f"{out}_l1 AS (SELECT {key}, x, y, "
        f"LENGTH(bin(x {idiv} y)) - 1 AS e FROM {out}_l0)",
        f"{out}_m0 AS (SELECT {key}, e, "
        f"(x * {s}) {idiv} (y * {_shl1('e', dialect)}) AS m, "
        f"CAST(0 AS BIGINT) AS acc FROM {out}_l1)",
    ]
    for i in range(frac_bits):
        parts.append(
            f"{out}_m{i + 1} AS (SELECT {key}, e, "
            f"CASE WHEN msq >= {2 * s} THEN msq {idiv} 2 ELSE msq END AS m, "
            f"acc * 2 + CASE WHEN msq >= {2 * s} THEN 1 ELSE 0 END AS acc "
            f"FROM (SELECT {key}, e, (m * m) {idiv} {s} AS msq, acc "
            f"FROM {out}_m{i}) t)"
        )
    parts.append(
        f"{out} AS (SELECT {key}, e * {1 << frac_bits} + acc AS lg_fp "
        f"FROM {out}_m{frac_bits})"
    )
    return ", ".join(parts)
