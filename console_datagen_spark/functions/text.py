"""Text tokenization / shingling helpers (built-in functions only)."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (fixture text is space-separated tokens)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def shingles(toks: Column, n: int = 3) -> Column:
    """Array of n-token shingles joined by single spaces.

    Caller must guarantee size(toks) >= n (Spark's ``sequence`` counts
    DOWN when start > stop, which would fabricate bogus indices).
    """
    return F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
