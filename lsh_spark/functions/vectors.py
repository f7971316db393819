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


def manhattan_padded(q: Column, c: Column) -> Column:
    """A5: Manhattan distance with the reference's size-equalization
    (``matching_algorithms.py:137-151``): the query is zero-padded or
    truncated to the CANDIDATE's length, then Σ|c_i − q_i|. Integer inputs
    stay exact int64 (no float drift between engines)."""
    idx = F.sequence(F.lit(1), F.greatest(F.size(c), F.lit(1)))
    # try_element_at: NULL (→ 0) past the query's end, ANSI-safe
    terms = F.when(F.size(c) > 0, F.transform(
        idx,
        lambda i: F.abs(F.element_at(c, i)
                        - F.coalesce(F.try_element_at(q, i), F.lit(0)))
    )).otherwise(F.array().cast("array<long>"))
    return F.aggregate(terms, F.lit(0).cast("long"), lambda acc, v: acc + v)


# the reference's five fixed tempo-rescaling factors
# (``matching_algorithms.py:112-113``): 0.5, 0.75, 1.0, 1.25, 1.5
SCALING_FACTORS = ((1, 2), (3, 4), (1, 1), (5, 4), (3, 2))


def rescale_seq(q: Column, num: int, den: int) -> Column:
    """A4: the reference's chunked rescaling (``_rescale_audio``,
    ``matching_algorithms.py:111-134``): walk the sequence in chunks of
    ``den``; when lengthening (num > den) repeat each chunk's last element;
    keep the first ``num`` elements of each chunk."""
    if num == den:
        return q
    n_chunks = F.ceil(F.size(q) / F.lit(den)).cast("int")
    def chunk(i):
        c = F.slice(q, i * den + 1, den)
        if num > den:
            c = F.concat(c, F.slice(c, -1, 1))
        return F.slice(c, 1, num)
    return F.when(F.size(q) > 0,
                  F.flatten(F.transform(F.sequence(F.lit(0), n_chunks - 1), chunk))) \
            .otherwise(q)


def linear_scaling_distance(q: Column, c: Column) -> Column:
    """A6: the reference's linear-scaling matcher
    (``matching_algorithms.py:153-176``): Manhattan distance between the
    candidate and each of the five rescaled queries; score = the minimum.
    (The reference optionally skips zero distances as 'noise' behind the
    ``include_zero_distance`` flag and has an acknowledged bug in that
    branch at ``:173-176``; we implement the plain minimum.)"""
    dists = [manhattan_padded(rescale_seq(q, n, d), c) for n, d in SCALING_FACTORS]
    return F.least(*dists)
