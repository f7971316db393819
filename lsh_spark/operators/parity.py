"""Reference-parity mode: seeded-permutation MinHash, min+max selection.

Reproduces the reference's indexing-side semantics EXACTLY (north_rule:
"matching the reference's cluster assignments (dup-pair recall≥0.99) at the
same shingle/signature config"):

 * windowed pieces with floor(len/shift) windows and short tails (quirk Q7,
   reference ``lsh.py:52-60``), stride-downsampled (``lsh.py:46-48``);
 * vocabulary ids assigned by first occurrence, docs in sorted doc_id order
   (reference ``lsh.py:135-142`` insertion order — made deterministic and
   distributed via min(struct(doc_rank, pos)) + row_number);
 * permutation family ``np.random.seed(i)`` + shuffle of [1..V]
   (reference ``lsh.py:213-219``, seeds 0..P-1 at ``:241``);
 * selection functions [min, max] → 2·P signature rows (reference
   ``constants.py:6-10``, ``lsh.py:245-255``);
 * r=1 banding / any-collision candidates with per-band-once counting
   (reference ``lsh.py:252-266,307-308``, quirk Q5).

Scale note: the permutation matrix is O(P·V) and is broadcast — inherently
vocabulary-bound, exactly why the scalable mode (operators/minhash.py) swaps
in the affine hash family. Parity mode exists for the recall gate against
the reference oracle at fixture scale; the row_number id assignment runs as
a single-partition window (documented, fixture-scale only).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T

from lsh_spark.operators.lsh_bands import candidate_pairs as _cand_pairs
from lsh_spark.config import DedupConfig


def reference_piece_udf(length: int, shift: int, stride: int):
    """pandas UDF: text → array of window pieces (space-joined), reference
    windowing incl. short tails (Q7). Duplicates preserved (vocabulary
    assignment looks at every occurrence, though ids are first-occurrence)."""
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def extract(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            toks = text.split() if text else []
            pieces = []
            for w in range(len(toks) // shift):
                piece = toks[w * shift: w * shift + length: stride]
                if piece:
                    pieces.append(" ".join(piece))
            out.append(pieces)
        return pd.Series(out)
    return extract


def vocabulary_ids(pieces_long: DataFrame) -> DataFrame:
    """(piece → 1-based id) by global first occurrence: docs in sorted
    doc_id order, pieces in extraction order (reference insertion order)."""
    first = (
        pieces_long.groupBy("piece")
        .agg(F.min(F.struct("doc_id", "pos")).alias("first_occ"))
    )
    w = Window.orderBy("first_occ")
    return first.select("piece", F.row_number().over(w).alias("piece_id"))


def parity_signatures(spark: SparkSession, docs: DataFrame,
                      length: int, shift: int, stride: int,
                      num_perms: int) -> DataFrame:
    """(doc_id, text) → (doc_id, sig array<bigint> of length 2·P)."""
    piece_udf = reference_piece_udf(length, shift, stride)
    pieces_long = docs.select(
        "doc_id", F.posexplode(piece_udf(F.col("text"))).alias("pos", "piece"))
    vocab = vocabulary_ids(pieces_long)
    vocab_size = vocab.count()

    # seeded permutation matrix, broadcast to executors
    base = np.arange(1, vocab_size + 1, dtype=np.int64)
    perms = np.empty((num_perms, vocab_size), dtype=np.int64)
    for i in range(num_perms):
        np.random.seed(i)
        p = base.copy()
        np.random.shuffle(p)
        perms[i] = p
    bc = spark.sparkContext.broadcast(perms)

    doc_ids = (
        pieces_long.join(vocab, "piece")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("piece_id")).alias("piece_ids"))
    )

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pm = bc.value
        p = pm.shape[0]
        for batch in batches:
            ids_col = batch.column("piece_ids")
            docs_col = batch.column("doc_id")
            sigs = []
            keep = []
            for row in range(len(docs_col)):
                ids = ids_col[row].as_py()
                if not ids:
                    keep.append(False)
                    continue
                keep.append(True)
                vals = pm[:, np.asarray(ids, dtype=np.int64) - 1]
                sig = np.empty(2 * p, dtype=np.int64)
                sig[0::2] = vals.min(axis=1)
                sig[1::2] = vals.max(axis=1)
                sigs.append(sig)
            kept_ids = docs_col.filter(pa.array(keep))
            if not sigs:
                continue
            flat = pa.array(np.concatenate(sigs), pa.int64())
            sig_col = pa.FixedSizeListArray.from_arrays(flat, 2 * p) \
                        .cast(pa.list_(pa.int64()))
            yield pa.RecordBatch.from_arrays([kept_ids, sig_col],
                                             names=["doc_id", "sig"])

    return doc_ids.mapInArrow(kernel, "doc_id string, sig array<bigint>")


def parity_candidate_pairs(spark: SparkSession, docs: DataFrame,
                           length: int = 10, shift: int = 1, stride: int = 1,
                           num_perms: int = 12) -> DataFrame:
    """Reference-exact candidate pairs (doc_a, doc_b, band_agreement)."""
    sigs = parity_signatures(spark, docs, length, shift, stride, num_perms)
    bands = sigs.select(F.posexplode("sig").alias("band_id", "band_hash"), "doc_id") \
                .select(F.col("band_id").cast("int"), "band_hash", "doc_id")
    cfg = DedupConfig(num_perms=2 * num_perms, band_rows=1)
    return _cand_pairs(bands, cfg, all_pairs=True)
