"""Vector (embedding) column helpers over ``array<float>`` columns.

Dot products / norms are built with ``F.aggregate`` / ``F.zip_with`` —
JVM-side, codegen'd, no Python.  Computation is pinned to DOUBLE so the
DuckDB oracle (``list_cosine_similarity`` over ``DOUBLE[]``) agrees to
~1e-15; query surfaces round to 6 decimals before comparing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def vec_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def vec_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return vec_dot(a, b) / (vec_norm(a) * vec_norm(b))
