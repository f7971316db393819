"""Vector math over array<float> columns as built-in expressions.

Reference analog: cosine similarity over aligned TF-IDF vectors
(``matching_algorithms.py:34-52``: dot/(‖q‖·‖s‖), zero on zero norm).
Here dot products are `aggregate(zip_with(...))` — JVM-side, codegen'd,
no Python; the Arrow/NumPy variant lives in operators/knn.py for the
batched top-k path.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either norm is 0 (reference
    ``matching_algorithms.py:49-51``)."""
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))
