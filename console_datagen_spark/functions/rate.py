"""The reference's sawtooth rate law (SURVEY §2.2 G1).

rate(t_ms) = 100 * ((t_ms / 10000) mod 5) + 10  → {10,110,210,310,410} msg/s,
period 50 s, mean 210 (DataGenerator.java:458-459).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

RATE_VALUES = (10, 110, 210, 310, 410)
RATE_PERIOD_S = 50
RATE_MEAN = 210
RATE_PEAK = 410


def rate_for_millis(ms: Column) -> Column:
    """Messages/sec for a wall-clock milliseconds column."""
    return (100 * F.pmod(F.floor(ms / 10000), 5) + 10).cast("long")


def rate_for_millis_py(ms: int) -> int:
    return 100 * ((ms // 10000) % 5) + 10
