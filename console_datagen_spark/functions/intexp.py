"""Exact-integer fixed-point base-2 exponential, dual-dialect SQL.

Companion to ``intlog.log2_fp_ctes``: where that maps counts into the
log domain deterministically, this maps fixed-point log-domain values
back — so rational POWERS like the temperature-sampling law
``w = n^alpha`` (alpha = 0.3, Conneau et al. 2020 XLM-R) become
``exp2(alpha * log2 n)`` in pure BIGINT arithmetic, bit-identical on
Spark and DuckDB. The engines' ``POW``/``EXP2`` delegate to libm whose
last-ulp rounding differs across platforms, which is exactly what the
hash-exact oracle contract cannot tolerate; ``sqrt`` (IEEE
correctly-rounded, used by pipeline_temperature_mix) only reaches
alpha = 1/2.

Method: split x_fp (units of 2^-FRAC_BITS bits, x_fp >= 0) into the
integer exponent e = x_fp DIV 2^10 and the 10-bit fraction f; then

    2^(f/1024) = prod over set bits j of f of  2^(2^(j-10))

with the ten constants C_j = round(S * 2^(2^(j-10))) baked in at scale
S = 2^20, one conditional multiply-and-rescale per bit (the classic
CORDIC-free binary exponential). Each step truncates < 2^-20 relative
and each constant is rounded to < 2^-21, so the result is within
~2^-15 relative of true — a DETERMINISTIC spec shared by both engines,
which is all the certification needs (the accuracy just has to be far
below the permille/ppm quantization the consumers emit).

Domain: 0 <= x_fp <= 42 << FRAC_BITS (result m * 2^e stays in BIGINT:
m < 2^21, e <= 42). Callers with larger exponents should carry e
separately and only materialize the mantissa.
"""

from __future__ import annotations

from .intlog import FRAC_BITS, MANT_SCALE

# C[j] = round(S * 2^(2^(j-FRAC_BITS))) for bit j of the fraction
_CONSTS = [
    round(MANT_SCALE * 2 ** (2 ** (j - FRAC_BITS))) for j in range(FRAC_BITS)
]


def exp2_fp_ctes(
    src: str,
    key: str,
    xfp: str,
    dialect: str,
    out: str = "ex",
) -> str:
    """CTE-chain text computing ``ex_fp ~= 2^FRAC_BITS' * 2^(xfp/2^10)``
    at mantissa scale ``MANT_SCALE`` (2^20).

    ``src`` is an existing CTE/table with one row per distinct argument,
    ``key`` its key column, ``xfp`` a non-negative fixed-point
    log-domain expression (units 2^-10 bits, e.g. intlog output or a
    rational multiple of it). Returns ``"name AS (...), ..."`` text (no
    leading WITH, no trailing comma) whose final CTE ``out`` exposes
    (key, ex_fp). Splice into a WITH list after ``src``.
    """
    idiv = "DIV" if dialect == "spark" else "//"
    s = MANT_SCALE
    one = 1 << FRAC_BITS
    if dialect == "spark":

        def shl(e_expr: str) -> str:
            return f"shiftleft(CAST(1 AS BIGINT), CAST({e_expr} AS INT))"

    else:

        def shl(e_expr: str) -> str:
            return f"(CAST(1 AS BIGINT) << CAST({e_expr} AS INT))"

    parts = [
        f"{out}_x0 AS (SELECT {key}, "
        f"CAST({xfp} AS BIGINT) {idiv} {one} AS {out}_e, "
        f"CAST({xfp} AS BIGINT) % {one} AS {out}_f, "
        f"CAST({s} AS BIGINT) AS {out}_m FROM {src})"
    ]
    prev = f"{out}_x0"
    for j in range(FRAC_BITS - 1, -1, -1):
        name = f"{out}_x{FRAC_BITS - j}"
        parts.append(
            f"{name} AS (SELECT {key}, {out}_e, {out}_f, "
            f"CASE WHEN ({out}_f {idiv} {1 << j}) % 2 = 1 "
            f"THEN ({out}_m * {_CONSTS[j]}) {idiv} {s} "
            f"ELSE {out}_m END AS {out}_m FROM {prev})"
        )
        prev = name
    parts.append(
        f"{out} AS (SELECT {key}, {out}_m * {shl(f'{out}_e')} AS ex_fp "
        f"FROM {prev})"
    )
    return ", ".join(parts)
