"""Exact-substring pass: shared long token spans & containment.

Third pass of the cascade (BASELINE.json north_star: "suffix-array
exact-substring passes"). MinHash misses pairs whose global Jaccard is low
but that share a long verbatim span (the `substring` mutation class —
fixture jaccard_true ≈ 0.3 < threshold); this pass catches them.

Spark-first decomposition:
 * ``substring_candidate_pairs`` — docs sharing ANY exact k-token window:
   the k-gram fingerprints ARE suffix-array buckets of depth k; a shared
   ≥k-token substring implies a shared k-gram (stride 1), so candidate
   generation is a fingerprint equi-join — fully relational, skew-handled
   like the MinHash bands. This is the 100 TB-safe formulation: no global
   suffix array, one shuffle on gram hash.
 * ``containment_pairs`` — full-document containment (doc_a's text is a
   substring of doc_b's): A contained in B ⟹ A's first k-gram occurs among
   B's k-grams, so the same join prunes, then `contains()` verifies —
   exact, no false negatives for docs with ≥ k tokens.
 * ``partition_suffix_lcs`` — per-partition suffix-array worker
   (mapInPandas): builds a sorted-suffix structure over the partition's
   concatenated token stream and reports the longest common prefix length
   between adjacent suffixes from different docs — the classic
   suffix-array LCS lower bound, used to *measure* overlap length for pairs
   already co-partitioned (e.g. within a candidate cluster).

Reference analog: the reference's recursive-alignment matcher (RA,
``matching_algorithms.py:238-285``) exists to find localized similarity
despite global drift; the substring pass covers that role for text
(SURVEY.md §2.7 A8 mapping).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from lsh_spark.config import DedupConfig
from lsh_spark.functions.hashing import hash64
from lsh_spark.functions.text import shingles_col, tokens_col


def _gram_hashes(docs: DataFrame, k: int, mode: str) -> DataFrame:
    grams = F.array_distinct(shingles_col(tokens_col(F.col("text")), k, 1))
    return docs.select(
        "doc_id",
        F.explode(F.transform(grams, lambda s: hash64(s, mode))).alias("gram_hash"),
    )


def substring_candidate_pairs(docs: DataFrame, cfg: DedupConfig,
                              sample_mod: int | None = None) -> DataFrame:
    """Pairs sharing ≥1 exact ``substring_k``-token window, with the count
    of shared distinct windows. Output: (doc_a, doc_b, shared_grams).

    ``sample_mod=None`` → dense, exact, oracle-checkable (built-in exprs).
    ``sample_mod=w`` → the 100 TB path: rolling-hash gram fingerprints via
    the Arrow kernel with content-defined sampling (both docs of a shared
    span select the SAME grams; a span of m grams is missed with prob
    (1-1/w)^m — at w=8 and a 100-gram span that is 2e-6). Join input and
    gram hashing drop by ~w×.
    """
    if sample_mod:
        from lsh_spark.operators.shingle import gram_hashes_fast
        g = (gram_hashes_fast(docs, cfg.substring_k, 1, sample_mod=sample_mod)
             .select("doc_id", F.explode("hashes").alias("gram_hash")))
    else:
        g = _gram_hashes(docs, cfg.substring_k, cfg.hash_mode)
    a = g.select(F.col("doc_id").alias("doc_a"), "gram_hash")
    b = g.select(F.col("doc_id").alias("doc_b"), "gram_hash")
    return (
        a.join(b, "gram_hash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("shared_grams"))
    )


def containment_pairs(docs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(inner, outer) pairs where inner.text is a verbatim substring of
    outer.text, inner has ≥ substring_k tokens, inner != outer.

    Prune: inner's FIRST k-gram must appear among outer's k-grams.
    Verify: contains(outer.text, inner.text). Exact and complete for docs
    with ≥ k tokens.
    """
    k, mode = cfg.substring_k, cfg.hash_mode
    toks = tokens_col(F.col("text"))
    firsts = docs.select(
        F.col("doc_id").alias("inner"),
        F.col("text").alias("inner_text"),
        hash64(F.array_join(F.slice(toks, 1, k), " "), mode).alias("gram_hash"),
    ).filter(F.size(tokens_col(F.col("inner_text"))) >= k)
    grams = _gram_hashes(docs, k, mode).select(
        F.col("doc_id").alias("outer"), "gram_hash")
    outer_text = docs.select(F.col("doc_id").alias("outer"),
                             F.col("text").alias("outer_text"))
    return (
        firsts.join(grams, "gram_hash")
        .filter(F.col("inner") != F.col("outer"))
        .select("inner", "outer", "inner_text").distinct()
        .join(outer_text, "outer")
        .filter(F.expr("contains(outer_text, inner_text)"))
        .select("inner", "outer")
    )


def partition_suffix_lcs(docs: DataFrame, min_chars: int = 80,
                         num_partitions: int | None = None) -> DataFrame:
    """Per-partition suffix-array scan: cross-doc common substrings.

    For each partition: concatenate its docs' texts (with unique
    separators), build the suffix array via argsort of suffixes, walk
    adjacent suffixes belonging to different docs and emit pairs whose
    longest common prefix ≥ ``min_chars``.

    Memory is bounded per partition (SURVEY.md §7.4 item 4): repartition by
    doc so partition byte size stays manageable; the operator only finds
    *intra-partition* pairs — it is used inside candidate clusters (already
    co-partitioned) or as a sampling pass, not as the global dedup join.
    Output: (doc_a, doc_b, lcs_len int).
    """
    if num_partitions:
        docs = docs.repartition(num_partitions, "doc_id")

    def worker(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            texts = pdf["text"].tolist()
            ids = pdf["doc_id"].tolist()
            if len(texts) < 2:
                yield pd.DataFrame({"doc_a": [], "doc_b": [], "lcs_len": []}).astype(
                    {"doc_a": str, "doc_b": str, "lcs_len": "int64"})
                continue
            # doc-id per character position, '\x00' separators break matches
            corpus = "\x00".join(texts)
            owner = np.zeros(len(corpus), dtype=np.int32)
            pos = 0
            for di, t in enumerate(texts):
                owner[pos:pos + len(t)] = di
                pos += len(t) + 1
            n = len(corpus)
            # suffix order via numpy argsort on fixed-width prefixes, refined
            # by python cmp fallback: use sorted() on suffix start indices
            sa = sorted(range(n), key=lambda i: corpus[i:i + min_chars * 2])
            best: dict[tuple[int, int], int] = {}
            for j in range(1, n):
                i1, i2 = sa[j - 1], sa[j]
                d1, d2 = owner[i1], owner[i2]
                if d1 == d2:
                    continue
                # lcp of the two suffixes, capped (we only care ≥ min_chars)
                cap = min(n - i1, n - i2, min_chars * 4)
                lcp = 0
                while lcp < cap and corpus[i1 + lcp] == corpus[i2 + lcp] \
                        and corpus[i1 + lcp] != "\x00":
                    lcp += 1
                if lcp >= min_chars:
                    key = (min(d1, d2), max(d1, d2))
                    if best.get(key, 0) < lcp:
                        best[key] = lcp
            rows = [(min(ids[a], ids[b]), max(ids[a], ids[b]), l)
                    for (a, b), l in best.items()]
            yield pd.DataFrame(rows, columns=["doc_a", "doc_b", "lcs_len"]).astype(
                {"doc_a": str, "doc_b": str, "lcs_len": "int64"})

    return (
        docs.select("doc_id", "text")
        .mapInPandas(worker, "doc_a string, doc_b string, lcs_len long")
        .groupBy("doc_a", "doc_b").agg(F.max("lcs_len").cast("long").alias("lcs_len"))
    )
