"""Shingle extraction operators: doc → distinct shingle hashes.

Two implementations with identical semantics:

* ``doc_shingle_hashes`` — built-in Column expressions end-to-end
  (tokens → k-grams → hash → array_distinct). Whole-stage-codegen'd;
  also the oracle-checkable path when hash_mode='portable'.

* ``doc_shingle_hashes_arrow`` — Arrow-vectorized kernel (mapInArrow):
  tokenize + shingle + hash in NumPy/pandas batches. This is the
  north_star-mandated form ("shingled per-turn and per-conversation with
  vectorized pandas/Arrow UDFs"); at 100 TB it avoids materializing large
  intermediate shingle-string arrays in the JVM row format and fuses
  tokenize→hash→distinct in one pass over Arrow buffers.

Reference analog: W1/W2 window extraction + vocabulary tokenization
(reference ``lsh.py:40-65,68-121,164-206``); the dense term-document matrix
(``lsh.py:196-202``) is never materialized — the long/array form of distinct
(doc, shingle_hash) IS the sparse characteristic matrix.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from lsh_spark.config import DedupConfig
from lsh_spark.functions.hashing import hash64
from lsh_spark.functions.text import distinct_shingles_col, tokens_col

SHINGLE_SCHEMA = "doc_id string, hashes array<bigint>"


def doc_shingle_hashes(docs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(doc_id, text) → (doc_id, hashes array<bigint>) via built-in exprs."""
    sh = distinct_shingles_col(tokens_col(F.col("text")), cfg.shingle_k, cfg.shingle_stride)
    return docs.select(
        "doc_id",
        F.transform(sh, lambda s: hash64(s, cfg.hash_mode)).alias("hashes"),
    )


def doc_shingle_hashes_arrow(docs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Same contract, Arrow-vectorized (one Python batch per Arrow batch,
    no per-row Python round trips)."""
    k, stride, mode = cfg.shingle_k, cfg.shingle_stride, cfg.hash_mode
    mask60 = (1 << 60) - 1

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            doc_ids = batch.column("doc_id")
            texts = batch.column("text").to_pylist()
            out: list[list[int]] = []
            for text in texts:
                toks = text.split() if text else []
                if len(toks) < k:
                    out.append([])
                    continue
                seen = set()
                for i in range(0, len(toks) - k + 1, stride):
                    s = " ".join(toks[i:i + k])
                    if mode == "portable":
                        h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
                    else:
                        h = int.from_bytes(
                            hashlib.blake2b(s.encode(), digest_size=8).digest(),
                            "big") & mask60
                    seen.add(h)
                out.append(sorted(seen))
            yield pa.RecordBatch.from_arrays(
                [doc_ids, pa.array(out, pa.list_(pa.int64()))],
                names=["doc_id", "hashes"],
            )

    return docs.select("doc_id", "text").mapInArrow(kernel, SHINGLE_SCHEMA)


def explode_shingles(doc_hashes: DataFrame) -> DataFrame:
    """Long format (doc_id, shingle_hash) — the sparse characteristic matrix
    (reference analog: td_matrix cells, ``lsh.py:196-202``)."""
    return doc_hashes.select(
        "doc_id", F.explode("hashes").alias("shingle_hash")
    )
