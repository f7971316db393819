"""A7/A9 full-depth alignment matchers as batched Arrow kernels.

The Column-algebra forms (functions/vectors.py: ``bals_distance``,
``ktra_distance``) cover the SQL-expressible configurations and are
oracle-checked. This module carries the reference's FULL recursion —
``_recursive_align`` with MAX_RA_DEPTH=3 splitting query/candidate into
40/50/60% portions, and KTRA's halving key-search on top of it
(reference ``matching_algorithms.py:240-316``) — as a NumPy
transcription applied per candidate pair via mapInPandas. Recursion with
data-dependent splits is not expressible in SQL; correctness is pinned
by tests/test_round3_ops.py against an independently-written iterative
(explicit-stack) implementation.

Scale shape: one Arrow batch in, one scalar distance per pair out; the
pair list comes from an LSH/kNN prefilter upstream, never all-pairs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame

# reference constants.py:116-123
BALS_SHIFT_SIZE = 15
MAX_RA_DEPTH = 3
MAX_KTRA_DEPTH = 2
INITIAL_KTRA_K = 1.0
# reference matching_algorithms.py:258 — the 10..90 sweep is commented
# out as too slow; the shipped sweep is 40/50/60%
RA_PORTION_PERCENTS = (40, 50, 60)

_SCALING = ((1, 2), (3, 4), (1, 1), (5, 4), (3, 2))


def _rescale(q: np.ndarray, num: int, den: int) -> np.ndarray:
    """Chunked rescale (reference ``_rescale_audio``,
    matching_algorithms.py:111-134)."""
    if num == den or q.size == 0:
        return q
    out = []
    for start in range(0, q.size, den):
        chunk = q[start:start + den]
        if num > den:
            chunk = np.concatenate([chunk, chunk[-1:]])
        out.append(chunk[:num])
    return np.concatenate(out)


def _manhattan(q: np.ndarray, c: np.ndarray) -> float:
    """Size-equalized Manhattan (reference ``:137-151``)."""
    if c.size == 0:
        return 0.0
    if q.size < c.size:
        q = np.concatenate([q, np.zeros(c.size - q.size, q.dtype)])
    else:
        q = q[:c.size]
    return float(np.abs(c - q).sum())


def _ls(q: np.ndarray, c: np.ndarray) -> tuple[float, np.ndarray]:
    """Linear scaling distance + the winning rescaled query
    (reference ``_calculate_linear_scaling``, ``:153-176``). Plain
    minimum — the reference's include_zero_distance=False branch checks
    only the LAST loop iteration's distance (acknowledged bug at
    ``:170-173``); this repo implements the plain minimum everywhere
    (same documented policy as functions/vectors.py A6)."""
    best, best_q = None, None
    for num, den in _SCALING:
        rq = _rescale(q, num, den)
        d = _manhattan(rq, c)
        if best is None or d < best:
            best, best_q = d, rq
    return best, best_q


def recursive_align(q: np.ndarray, c: np.ndarray, depth: int = 0) -> float:
    """Reference ``_recursive_align`` (``:240-269``): LS distance of the
    whole, then (below MAX_RA_DEPTH) split the rescaled query in half and
    the candidate at 40/50/60% boundaries, aligning left-left and
    right-right, keeping the global minimum."""
    min_d, rq = _ls(q, c)
    if rq is None or rq.size == 0 or c.size == 0:
        return min_d
    if depth < MAX_RA_DEPTH:
        q_half = rq.size // 2 + 1
        for pct in RA_PORTION_PERCENTS:
            size = int(c.size * pct / 100) + 1
            complement = c.size + 1 - size
            left = recursive_align(rq[:q_half], c[:size], depth + 1)
            right = recursive_align(rq[q_half:], c[complement:], depth + 1)
            min_d = min(left, right, min_d)
    return min_d


def bals(q: np.ndarray, c: np.ndarray) -> float:
    """Reference ``_calculate_bals`` (``:210-235``): min LS distance over
    the candidate and its four +/-15 shift variants (zero-filled and
    edge-replicated)."""
    def shift(x: np.ndarray, s: int, nearest: bool) -> np.ndarray:
        if x.size == 0 or s == 0:
            return x
        n = x.size
        m = min(abs(s), n)
        if s > 0:
            fill = np.full(m, x[0] if nearest else 0, x.dtype)
            return np.concatenate([fill, x[:n - m]])
        fill = np.full(m, x[-1] if nearest else 0, x.dtype)
        return np.concatenate([x[m:], fill])

    variants = [c,
                shift(c, BALS_SHIFT_SIZE, False),
                shift(c, -BALS_SHIFT_SIZE, False),
                shift(c, BALS_SHIFT_SIZE, True),
                shift(c, -BALS_SHIFT_SIZE, True)]
    return min(_ls(q, v)[0] for v in variants)


def ktra(q: np.ndarray, c: np.ndarray) -> float:
    """Reference ``_calculate_ktra`` (``:288-316``) at full recursion
    depth: mean-subtract both, then halving key-search over
    ``recursive_align``; minus direction checked first on ties, the
    deepest level's triple-minimum is returned."""
    q = q.astype(np.float64) - (q.mean() if q.size else 0.0)
    c = c.astype(np.float64) - (c.mean() if c.size else 0.0)
    k = INITIAL_KTRA_K
    result = None
    for depth in range(MAX_KTRA_DEPTH + 1):
        dm = recursive_align(q - k, c)
        dz = recursive_align(q, c)
        dp = recursive_align(q + k, c)
        result = min(dm, dz, dp)
        if depth < MAX_KTRA_DEPTH:
            if dm == result:
                q = q - k
            elif dp == result:
                q = q + k
            k = k / 2
    return result


def aligned_pair_distances(pairs_with_seqs: DataFrame,
                           algorithm: str = "ktra") -> DataFrame:
    """(doc_a, doc_b, seq_a array<long>, seq_b array<long>) →
    (doc_a, doc_b, distance double) under the full-recursion matcher.

    ``algorithm``: "ktra" (A9) | "bals" (A7) | "ra" (A8 exact form).
    Runs as mapInPandas — each Arrow batch of candidate pairs is scored
    in NumPy with zero driver involvement; upstream is expected to be an
    LSH/kNN candidate prefilter, so the pair count is linear in corpus
    size (never all-pairs)."""
    fn = {"ktra": ktra, "bals": bals,
          "ra": lambda q, c: recursive_align(q, c)}[algorithm]

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            da = batch.column("doc_a")
            db = batch.column("doc_b")
            sa = batch.column("seq_a").to_pylist()
            sb = batch.column("seq_b").to_pylist()
            dists = [fn(np.asarray(a or [], np.int64),
                        np.asarray(b or [], np.int64)) for a, b in zip(sa, sb)]
            yield pa.RecordBatch.from_arrays(
                [da, db, pa.array(dists, pa.float64())],
                names=["doc_a", "doc_b", "distance"])

    return pairs_with_seqs.select("doc_a", "doc_b", "seq_a", "seq_b") \
        .mapInArrow(kernel, "doc_a string, doc_b string, distance double")
