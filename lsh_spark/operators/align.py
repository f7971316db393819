"""A7/A8/A9 full-depth alignment matchers as batched Arrow kernels.

The Column-algebra forms (functions/vectors.py: ``bals_distance``,
``ktra_distance_pairs``) cover the SQL-expressible configurations and are
oracle-checked. This module carries the reference's FULL recursion —
``_recursive_align`` with MAX_RA_DEPTH=3 splitting query/candidate into
40/50/60% portions, and KTRA's halving key-search on top of it
(reference ``matching_algorithms.py:240-316``) — as a NumPy
transcription applied per candidate pair via mapInArrow.

Dispatcher-exact evaluation shape (reference ``:336-346``): RA and KTRA
receive a SINGLE query array (the raw use_ls=False query, or — for
use_ls=True — the pre-collapsed linear-scaling winner), so every
``_recursive_align`` node computes exactly ONE size-equalized Manhattan
distance, never the 5-way rescaling sweep.  The sweep exists only where
the dispatcher passes the rescaled list: BALS always, and the top node
of RA under use_ls=True.  Inside RA, ``include_zero_distance=False``
makes a zero node distance return MAX_FLOAT and prune the subtree
(reference ``:164-176``) — load-bearing, because deep nodes with empty
candidate portions would otherwise contribute distance 0 to the global
minimum.  BALS (include_zero_distance=True in the reference) keeps this
repo's documented plain-minimum policy, which skips the reference's
acknowledged last-iteration zero-distance bug (``:170-176``) — same
policy as functions/vectors.py A6.

Scale shape: one Arrow batch in, one scalar distance per pair out; the
pair list comes from an LSH/kNN prefilter upstream, never all-pairs.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame

# reference matching_algorithms.py:25 — float_info.max
MAX_FLOAT = sys.float_info.max
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


def _ls_single(q: np.ndarray, c: np.ndarray) -> tuple[float, np.ndarray | None]:
    """``_calculate_linear_scaling`` fed a single (non-list) query with
    include_zero_distance=False — the form every ``_recursive_align``
    node evaluates (reference ``:163-176``, list-wrap at ``:164-165``):
    ONE Manhattan distance; a zero distance is 'likely noise' and
    returns (MAX_FLOAT, None), which also prunes the node's recursion."""
    d = _manhattan(q, c)
    if d > 0.0:
        return d, q
    return MAX_FLOAT, None


def _ls_plain(q: np.ndarray, c: np.ndarray) -> tuple[float, np.ndarray]:
    """5-way rescaling sweep, plain minimum (BALS / A6 policy — the
    reference's ``include_zero_distance``/last-iteration quirk at
    ``:170-176`` is deliberately skipped; see module docstring)."""
    best, best_q = None, None
    for num, den in _SCALING:
        rq = _rescale(q, num, den)
        d = _manhattan(rq, c)
        if best is None or d < best:
            best, best_q = d, rq
    return best, best_q


def recursive_align(q: np.ndarray, c: np.ndarray, depth: int = 0) -> float:
    """Reference ``_recursive_align`` (``:240-269``), use_ls=False form:
    single Manhattan of the node's (query, candidate), then (below
    MAX_RA_DEPTH) split the query in half (size//2 + 1) and the
    candidate at 40/50/60% boundaries — size = int(c.size/100*pct + 1),
    reference ``utils.percent``: whole/100*part, division FIRST —
    aligning left-left and right-right, keeping the global minimum.
    Zero node distance → MAX_FLOAT, subtree pruned."""
    min_d, rq = _ls_single(q, c)
    if rq is None or rq.size == 0 or c.size == 0:
        return min_d
    return _descend(rq, c, min_d, depth)


def _descend(rq: np.ndarray, c: np.ndarray, min_d: float, depth: int) -> float:
    if depth < MAX_RA_DEPTH:
        q_half = rq.size // 2 + 1
        for pct in RA_PORTION_PERCENTS:
            size = int(c.size / 100 * pct + 1)
            complement = c.size + 1 - size
            left = recursive_align(rq[:q_half], c[:size], depth + 1)
            right = recursive_align(rq[q_half:], c[complement:], depth + 1)
            min_d = min(left, right, min_d)
    return min_d


def recursive_align_ls(q: np.ndarray, c: np.ndarray) -> float:
    """RA under the dispatcher's use_ls=True (reference ``:340-342``):
    the top node receives the five rescaled queries — one sweep, zero
    distances excluded (include_zero_distance=False), ``min`` first-wins
    on ties — and recursion descends on the WINNING rescaled query with
    single-array nodes below."""
    best, best_q, last_d = None, None, 0.0
    for num, den in _SCALING:
        rq = _rescale(q, num, den)
        last_d = _manhattan(rq, c)
        if last_d > 0.0 and (best is None or last_d < best):
            best, best_q = last_d, rq
    # reference :170-176 — the 'empty' check reads the LAST distance
    if not last_d:
        return MAX_FLOAT
    if best_q is None or best_q.size == 0 or c.size == 0:
        return best if best is not None else MAX_FLOAT
    return _descend(best_q, c, best, 0)


def bals(q: np.ndarray, c: np.ndarray) -> float:
    """Reference ``_calculate_bals`` (``:210-235``): min LS distance over
    the candidate and its four +/-15 shift variants (zero-filled and
    edge-replicated); the query side is always the 5-way rescaled sweep
    (dispatcher ``:340-342``, include_zero_distance=True)."""
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
    return min(_ls_plain(q, v)[0] for v in variants)


def ktra(q: np.ndarray, c: np.ndarray) -> float:
    """Reference ``_calculate_ktra`` (``:288-316``) at full recursion
    depth, use_ls=False form: mean-subtract both, then halving
    key-search where each direction is a SINGLE-array full-depth
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


def ktra_ls(q: np.ndarray, c: np.ndarray) -> float:
    """KTRA under use_ls=True (reference ``:352-358``): the 5-way LS
    sweep (include_zero_distance=True, plain min — repo policy) first
    collapses the query to the single winning rescaled variant, and
    ``_calculate_ktra`` runs on that winner.  Per-pair form: each pair
    collapses its own fresh rescalings (the reference reassigns the
    collapsed query across the candidate loop at ``:354`` — an
    order-dependent quirk a distributed per-pair operator deliberately
    does not reproduce; this matches its first-candidate behavior)."""
    _d, winner = _ls_plain(q, c)
    if winner is None:
        return MAX_FLOAT
    return ktra(winner, c)


def aligned_pair_distances(pairs_with_seqs: DataFrame,
                           algorithm: str = "ktra") -> DataFrame:
    """(doc_a, doc_b, seq_a array<long>, seq_b array<long>) →
    (doc_a, doc_b, distance double) under the full-recursion matcher.

    ``algorithm``: "ktra" (A9) | "bals" (A7) | "ra" (A8 exact form) |
    "ra_ls" (A8 under use_ls=True) | "ktra_ls" (A9 under use_ls=True).
    Runs as mapInArrow — each Arrow batch of candidate pairs is scored
    in NumPy with zero driver involvement; upstream is expected to be an
    LSH/kNN candidate prefilter, so the pair count is linear in corpus
    size (never all-pairs)."""
    fn = {"ktra": ktra, "bals": bals,
          "ra": lambda q, c: recursive_align(q, c),
          "ra_ls": recursive_align_ls,
          "ktra_ls": ktra_ls}[algorithm]

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

    src = pairs_with_seqs.select("doc_a", "doc_b", "seq_a", "seq_b")
    id_types = {f.name: f.dataType.simpleString() for f in src.schema.fields}
    out_schema = (f"doc_a {id_types['doc_a']}, doc_b {id_types['doc_b']}, "
                  f"distance double")
    return src.mapInArrow(kernel, out_schema)
