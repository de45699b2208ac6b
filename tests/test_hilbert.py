"""The unrolled Hilbert CTE fold must equal the textbook xy2d loop."""

from __future__ import annotations

import random

import duckdb

from console_datagen_spark.plans.layout import _HILBERT_ORDER, _hilbert_ctes


def _xy2d(order: int, x: int, y: int) -> int:
    d = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_fold_matches_reference():
    rng = random.Random(7)
    pts = [(rng.randrange(65536), rng.randrange(65536)) for _ in range(300)]
    pts += [(0, 0), (65535, 65535), (1, 0), (0, 1), (32768, 32767)]
    hctes, hfinal = _hilbert_ctes("base")
    vals = ", ".join(f"({x},{y})" for x, y in pts)
    sql = (
        f"WITH base AS (SELECT ok16, pk16, 0 AS z "
        f"FROM (VALUES {vals}) AS t(ok16, pk16)), {hctes} "
        f"SELECT ok16, pk16, hd FROM {hfinal}"
    )
    for x, y, hd in duckdb.connect().execute(sql).fetchall():
        assert hd == _xy2d(_HILBERT_ORDER, x, y), (x, y)


def test_hilbert_is_a_bijection_on_a_grid():
    """d must be unique per (x, y) — a collision would silently merge
    unrelated rows into one layout position."""
    hctes, hfinal = _hilbert_ctes("base")
    n = 64
    vals = ", ".join(f"({x},{y})" for x in range(n) for y in range(n))
    sql = (
        f"WITH base AS (SELECT ok16, pk16, 0 AS z "
        f"FROM (VALUES {vals}) AS t(ok16, pk16)), {hctes} "
        f"SELECT COUNT(DISTINCT hd) FROM {hfinal}"
    )
    assert duckdb.connect().execute(sql).fetchone()[0] == n * n
