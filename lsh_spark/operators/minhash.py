"""MinHash signature generation — NumPy matrix math inside mapInArrow.

Reference analog: the triple loop docs × permutations × selection-fns over a
dense vocab×docs matrix (reference ``lsh.py:222-269``, permutation at
``lsh.py:213-219``, min/max selection at ``lsh.py:245-255``). Complexity
there is O(D·P·V) dense multiplies on one core; here each Arrow batch
computes all P minima for all its docs in one broadcasted NumPy op
(O(P · total_shingles) on every executor core in parallel), and the dense
characteristic matrix never exists.

The signature kernel uses ``np.minimum.reduceat`` over the batch's
concatenated shingle hashes — one vectorized pass, no per-doc Python loop
in the hot path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from lsh_spark.config import DedupConfig
from lsh_spark.functions.hashing import M, minhash_params

SIG_SCHEMA = "doc_id string, sig array<bigint>"


def minhash_signatures(doc_hashes: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(doc_id, hashes array<bigint>) → (doc_id, sig array<bigint>).

    Docs with no shingles are dropped (the reference skips docs whose
    signature column is empty, ``lsh.py:252``; empty-pitch rows are dropped
    at load, ``json_manipulator.py:213``).
    """
    a_vec, b_vec = minhash_params(cfg.num_perms)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        chunk = 8  # perms per pass — bounds the (chunk × n_shingles) temp
        for batch in batches:
            doc_ids = batch.column("doc_id")
            hashes = batch.column("hashes")
            flat = hashes.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            offsets = hashes.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            # ListArray.flatten() respects a slice offset but the raw offsets
            # buffer does not — normalize so reduceat segment starts align
            # even if a batch ever arrives as a non-zero-offset slice
            offsets = offsets - offsets[0]
            lengths = np.diff(offsets)
            keep = lengths > 0
            if flat.size == 0 or not keep.any():
                continue
            starts = offsets[:-1][keep]
            xr = flat % M
            sig = np.empty((cfg.num_perms, keep.sum()), dtype=np.int64)
            for p0 in range(0, cfg.num_perms, chunk):
                a = a_vec[p0:p0 + chunk, None]
                b = b_vec[p0:p0 + chunk, None]
                hv = (a * xr[None, :] + b) % M
                # segment-min per doc per permutation
                sig[p0:p0 + chunk] = np.minimum.reduceat(hv, starts, axis=1)
            kept_ids = doc_ids.filter(pa.array(keep))
            sig_col = pa.FixedSizeListArray.from_arrays(
                pa.array(sig.T.ravel(), pa.int64()), cfg.num_perms
            ).cast(pa.list_(pa.int64()))
            yield pa.RecordBatch.from_arrays([kept_ids, sig_col],
                                             names=["doc_id", "sig"])

    return doc_hashes.mapInArrow(kernel, SIG_SCHEMA)


def exploded_signatures(doc_hashes: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Long form (doc_id, perm_id, minhash) — the oracle-checkable shape."""
    sigs = minhash_signatures(doc_hashes, cfg)
    return sigs.select(
        "doc_id", F.posexplode("sig").alias("perm_id", "minhash")
    ).select("doc_id", F.col("perm_id").cast("int").alias("perm_id"), "minhash")


def estimated_jaccard(sig_a: F.Column, sig_b: F.Column) -> F.Column:
    """Fraction of agreeing signature rows — the MinHash Jaccard estimate
    (reference analog: candidate collision counting, ``lsh.py:307-308``,
    where duplicate hits within one bucket count once — SURVEY.md Q5)."""
    agree = F.size(F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y),
                            lambda v: v))
    return agree / F.size(sig_a)
