"""Vector math over array<float> embedding columns — built-in expressions.

``F.zip_with`` + ``F.aggregate`` fold in strict left-to-right order in
double precision, which the DuckDB oracles mirror (CAST to DOUBLE[] before
list_inner_product); corpus queries additionally round to 4 decimals so the
hash compare is immune to any residual ULP difference.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in double, sequential fold."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; structured as dot/(norm·norm) — the oracle uses
    the identical association."""
    return dot(a, b) / (norm(a) * norm(b))


def cosine_prenorm(dot_ab: Column) -> Column:
    """When both sides are pre-normalized (the scale path — normalize once,
    not per pair), cosine IS the dot product."""
    return dot_ab


def normalize(a: Column) -> Column:
    """Unit-normalize an array<float> into array<double>."""
    n = norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)
