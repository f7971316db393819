"""Reference-parity gate: engine parity mode vs the pinned NumPy oracle.

north_rule: dup-pair recall ≥ 0.99 vs the reference's cluster assignments at
identical shingle-size / num-permutations / band-row config. The engine's
parity mode reproduces the reference's seeded permutations exactly, so the
assertion here is full equality (recall 1.0) of candidate pairs, agreement
counts, and the resulting cluster assignments.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lsh_spark.canonicalize import conversation_docs
from lsh_spark.operators.parity import parity_candidate_pairs
from lsh_spark.operators.connected_components import connected_components
from tests import oracle


CONFIGS = [
    # (window length, shift, stride, P, corpus size) — NLSH-style
    # (lsh.py:76-79, Q8) and PLSH-style (lsh.py:46-48) at fixture-friendly
    # P=12, plus the reference's default P=100 (constants.py:1)
    pytest.param(10, 1, 1, 12, 60, id="nlsh_style"),
    pytest.param(60, 15, 2, 12, 60, id="plsh_style"),
    pytest.param(10, 1, 1, 100, 36, id="nlsh_default_P100"),
    # the reference's stress sweep goes to P=1000
    # (code_samples/test_searches.py:31); tiny corpus keeps the NumPy
    # oracle's 1000 seeded permutations tractable
    pytest.param(10, 1, 1, 1000, 12, id="nlsh_stress_P1000"),
]


@pytest.mark.parametrize("length,shift,stride,num_perms,n_docs", CONFIGS)
def test_parity_candidate_pairs_exact(spark, t1_transcripts,
                                      length, shift, stride, num_perms, n_docs):
    docs_df = conversation_docs(t1_transcripts).select("doc_id", "text")
    # keep the NumPy oracle tractable: prefix of the corpus (incl. planted
    # duplicates, which are adjacent to their base conv in sorted order)
    subset = sorted(r["doc_id"] for r in docs_df.select("doc_id").collect())[:n_docs]
    docs_df = docs_df.filter(F.col("doc_id").isin(subset))
    docs = {r["doc_id"]: r["text"] for r in docs_df.collect()}

    ref_pairs, vocab, ref_sigs = oracle.reference_lsh(
        docs, length=length, shift=shift, stride=stride, num_perms=num_perms)

    got = parity_candidate_pairs(spark, docs_df, length=length, shift=shift,
                                 stride=stride, num_perms=num_perms)
    got_pairs = {(r["doc_a"], r["doc_b"]): r["band_agreement"]
                 for r in got.collect()}

    assert got_pairs == ref_pairs  # identical pairs AND agreement counts

    # identical cluster assignments (CC over the same edge set)
    edges = spark.createDataFrame(
        [(a, b) for (a, b) in ref_pairs], "doc_a string, doc_b string")
    ref_cc = {r["doc_id"]: r["cluster_id"]
              for r in connected_components(edges).collect()}
    got_cc = {r["doc_id"]: r["cluster_id"]
              for r in connected_components(
                  got.select("doc_a", "doc_b")).collect()}
    assert ref_cc == got_cc


def test_reference_windows_short_tails():
    """Quirk Q7: floor(len/shift) windows, tails clipped short."""
    toks = [str(i) for i in range(25)]
    wins = oracle.reference_windows(toks, length=10, shift=15, stride=1)
    assert len(wins) == 25 // 15
    wins2 = oracle.reference_windows(toks, length=10, shift=5, stride=1)
    assert len(wins2) == 5
    assert len(wins2[-1]) == 5  # tail window clipped
    # stride downsampling within window (PLSH EXTRACTING_INTERVAL=2)
    wins3 = oracle.reference_windows(toks, length=10, shift=5, stride=2)
    assert wins3[0] == tuple(str(i) for i in range(0, 10, 2))
