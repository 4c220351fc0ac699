"""Vector math over ``array<float>`` embedding columns — built entirely
from Spark's higher-order functions (``zip_with`` / ``aggregate``), so the
arithmetic runs JVM-side inside codegen: no UDF, no Python, no serialization.

All folds run left-to-right in double precision — the same evaluation
order the DuckDB oracles use (``list_inner_product`` on ``DOUBLE[]``), so
rank-based outputs are stable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def as_double(vec: Column) -> Column:
    """array<float> → array<double> (promote before any arithmetic)."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + left fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; callers pre-promote with :func:`as_double`."""
    return dot(a, b) / (norm(a) * norm(b))
