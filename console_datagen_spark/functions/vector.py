"""Vector math over ArrayType(FloatType) embedding columns.

All expressions are built-in higher-order functions (zip_with/aggregate):
they run inside the JVM with no Python round-trip, and — important for the
oracle contract — accumulate left-to-right in double precision, which is
bit-identical to DuckDB's ``list_inner_product`` over ``DOUBLE[]`` casts of
the same float32 values.

At 100 TB scale these stay embedded in whole-stage-codegen'd projections;
for very high dims a vectorized Pandas UDF over Arrow batches (numpy dot)
becomes competitive — see operators/similarity.py for the trade-off note.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def to_double_vec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
