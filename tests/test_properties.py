"""Property tests (SURVEY.md §5.4): order invariance, cascade modes,
hypothesis-driven shingle/Jaccard checks."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from lsh_spark.config import DedupConfig
from lsh_spark.plans.pipeline import dedup_pipeline
from tests import oracle


def test_clusters_invariant_under_row_order(spark, t1_transcripts):
    """Permutation invariance: shuffling physical row order must not change
    cluster assignments (SURVEY §5.4)."""
    cfg = DedupConfig()
    base = {r["doc_id"]: r["cluster_id"]
            for r in dedup_pipeline(spark, t1_transcripts, cfg).collect()}
    shuffled = t1_transcripts.orderBy(F.xxhash64("text", "conv_id"))
    perm = {r["doc_id"]: r["cluster_id"]
            for r in dedup_pipeline(spark, shuffled, cfg).collect()}
    assert base == perm


def test_cascade_subtract_mode(spark):
    """Reference C4 semantics: a pair rejected by MinHash verification must
    not re-enter through a later pass in subtract mode, but may in union
    mode. Construct: two docs sharing a long verbatim span (substring pass
    links them) but low global Jaccard (minhash candidates them via the
    shared shingles, verification rejects)."""
    span = " ".join(f"s{i}" for i in range(40))
    filler_a = " ".join(f"a{i}" for i in range(400))
    filler_b = " ".join(f"b{i}" for i in range(400))
    rows = []
    for doc, text in [("da", filler_a + " " + span),
                      ("db", filler_b + " " + span)]:
        rows.append((doc, 0, "user", text, None, "2024-01-01 00:00:00"))
    tr = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts string").withColumn("ts", F.col("ts").cast("timestamp"))
    # reference geometry pinned: C4 subtract semantics need the pair to be
    # CANDIDATED by minhash (any shared shingle collides some band at r=1)
    # then rejected by verification; at the r=2 scale default the pair may
    # never candidate, so there is nothing to subtract
    cfg = DedupConfig(jaccard_threshold=0.5, band_rows=1)

    union_lab = dedup_pipeline(spark, tr, cfg, cascade_mode="union").collect()
    assert len(union_lab) == 2  # substring pass links them

    sub_lab = dedup_pipeline(spark, tr, cfg, cascade_mode="subtract").collect()
    assert len(sub_lab) == 0  # rejected by filter 1 → excluded from pass 3


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(0, 30), min_size=0, max_size=60),
       st.integers(2, 8))
def test_reference_windows_properties(tokens, k):
    """Windows: count = floor(len/shift); every window is a contiguous
    slice; tails may be short but never empty (oracle impl, Q7)."""
    toks = [str(t) for t in tokens]
    wins = oracle.reference_windows(toks, length=k, shift=k)
    assert len(wins) == len(toks) // k
    for i, w in enumerate(wins):
        assert 0 < len(w) <= k
        assert list(w) == toks[i * k: i * k + k]


@settings(max_examples=25, deadline=None)
@given(st.sets(st.integers(0, 2**59), min_size=1, max_size=200),
       st.sets(st.integers(0, 2**59), min_size=1, max_size=200))
def test_minhash_estimate_unbiased_bounds(sa, sb):
    """Estimated Jaccard is within [0,1] and equals 1 iff sets equal (for
    the NumPy kernel at P=64; statistical accuracy tested elsewhere)."""
    import numpy as np
    from lsh_spark.functions.hashing import minhash_params, np_minhash
    a_vec, b_vec = minhash_params(64)
    siga = np_minhash(np.array(sorted(sa), dtype=np.int64), a_vec, b_vec)
    sigb = np_minhash(np.array(sorted(sb), dtype=np.int64), a_vec, b_vec)
    est = (siga == sigb).mean()
    assert 0.0 <= est <= 1.0
    if sa == sb:
        assert est == 1.0
