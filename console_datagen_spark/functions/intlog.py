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

Domain: x >= y >= 1, any BIGINT. A naive ``x * S`` mantissa would cap
the exact regime at x < 2^43 (~8.8e12) — fine for per-document counts
but NOT for corpus-total token counts at the 100 TB scale (~2e13+
tokens), where non-ANSI Spark silently wrapped while DuckDB raised an
overflow error (ADVICE r12). The chain instead forms the mantissa via
the floor-exact rational identity x*2^20/(y*2^e) == x*2^(20-j)/
(y*2^(e-j)) with j = min(e, 20): for e >= 20 (e.g. any total over a
small y) no multiply of x remains and the result is EXACT for all
BIGINT x; for e < 20 with x >= 2^(43+e), y is provably also huge
(y > x/2^(e+1)) and both are pre-shifted down together, preserving the
ratio to < 2^-41 relative — far below one 2^-10-bit output unit. Still
pure BIGINT, still bit-identical across engines everywhere.
"""

from __future__ import annotations

MANT_SCALE = 1 << 20  # mantissa fixed-point scale S; m*m <= 2^42 in BIGINT
FRAC_BITS = 10  # output scale: units of 2^-10 bits


def _shl1(e_expr: str, dialect: str) -> str:
    """1 << e as BIGINT in either dialect."""
    if dialect == "spark":
        return f"shiftleft(CAST(1 AS BIGINT), CAST({e_expr} AS INT))"
    return f"(CAST(1 AS BIGINT) << CAST({e_expr} AS INT))"


def _shr(v_expr: str, k_expr: str, dialect: str) -> str:
    """v >> k in either dialect (v already BIGINT, k >= 0)."""
    if dialect == "spark":
        return f"shiftright({v_expr}, CAST({k_expr} AS INT))"
    return f"({v_expr} >> CAST({k_expr} AS INT))"


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
    sb = s.bit_length() - 1  # mantissa scale bits (20)
    parts = [
        # integer part e (exact, from the UNSHIFTED values). Mantissa
        # m = floor(x*S / (y*2^e)) is formed via the exact rational
        # identity  x*2^sb/(y*2^e) == x*2^(sb-j)/(y*2^(e-j)), j=min(e,sb):
        # for e >= sb the x-side factor is 1 (no overflow possible, any
        # BIGINT x); for e < sb overflow needs bitlen(x)+sb-j > 63, and
        # there y > x/2^(e+1) is also huge, so pre-shifting BOTH by k
        # preserves the ratio to < 2^-41 relative (ADVICE r12: previously
        # x*2^sb wrapped in Spark / errored in DuckDB at x >= 2^43).
        # k = 0 and the identity is floor-exact for all in-domain x, so
        # results there are bit-identical to the unguarded spelling.
        # internal columns carry the {out}_ prefix so they can never
        # collide with the caller's key column name
        f"{out}_l0 AS (SELECT {key}, CAST({x} AS BIGINT) AS {out}_x, "
        f"CAST({y} AS BIGINT) AS {out}_y FROM {src})",
        f"{out}_l1 AS (SELECT {key}, {out}_x, {out}_y, e, "
        f"GREATEST(LENGTH(bin({out}_x)) + ({sb} - LEAST(e, {sb})) - 63, 0) "
        f"AS {out}_k "
        f"FROM (SELECT {key}, {out}_x, {out}_y, "
        f"LENGTH(bin({out}_x {idiv} {out}_y)) - 1 AS e "
        f"FROM {out}_l0) {out}_e0)",
        # mantissa in [S, 2S): the clamp is a deterministic safety net
        # for the pre-shifted regime; a no-op for k = 0
        f"{out}_m0 AS (SELECT {key}, e, LEAST(GREATEST("
        f"({out}_xs * {_shl1(f'{sb} - {out}_j', dialect)}) {idiv} "
        f"({out}_ys * {_shl1(f'e - {out}_j', dialect)}), "
        f"{s}), {2 * s - 1}) AS m, "
        f"CAST(0 AS BIGINT) AS acc FROM ("
        f"SELECT {key}, e, LEAST(e, {sb}) AS {out}_j, "
        f"{_shr(f'{out}_x', f'{out}_k', dialect)} AS {out}_xs, "
        f"GREATEST({_shr(f'{out}_y', f'{out}_k', dialect)}, "
        f"CAST(1 AS BIGINT)) AS {out}_ys "
        f"FROM {out}_l1) {out}_pre)",
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
