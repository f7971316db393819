"""Winnowing fingerprints: selection guarantee + overlap detection."""

from __future__ import annotations

from lsh_spark.config import DedupConfig
from lsh_spark.operators.winnow import winnow_fingerprints, winnow_overlap_pairs

CFG = DedupConfig(shingle_k=3)
W = 4


def test_shared_span_guarantees_shared_fingerprint(spark):
    """Any shared substring of ≥ w + k − 1 tokens must contribute ≥1
    common selected fingerprint (the winnowing guarantee)."""
    span = " ".join(f"s{i}" for i in range(W + CFG.shingle_k - 1 + 4))
    rows = [("a", "x1 x2 x3 " + span + " x4"),
            ("b", "y1 " + span + " y2 y3"),
            ("c", " ".join(f"z{i}" for i in range(20)))]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    fp = {d: set() for d in "abc"}
    for r in winnow_fingerprints(docs, CFG, window=W).collect():
        fp[r["doc_id"]].add(r["fp_hash"])
    assert fp["a"] & fp["b"]
    assert not fp["a"] & fp["c"]
    # density: ~2/(w+1) of grams selected, far fewer than all grams
    n_grams_a = len(rows[0][1].split()) - CFG.shingle_k + 1
    assert len(fp["a"]) < n_grams_a


def test_overlap_pairs(spark):
    span = " ".join(f"s{i}" for i in range(30))
    rows = [("a", "x1 x2 " + span), ("b", span + " y1"), ("c", "q1 q2 q3 q4 q5")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    got = {(r["doc_a"], r["doc_b"]): r["shared_fps"]
           for r in winnow_overlap_pairs(docs, CFG, window=W).collect()}
    assert set(got) == {("a", "b")}
    assert got[("a", "b")] >= 2


def test_fingerprints_deterministic(spark):
    docs = spark.createDataFrame([("d", " ".join(f"t{i}" for i in range(50)))],
                                 "doc_id string, text string")
    f1 = sorted(r["fp_hash"] for r in winnow_fingerprints(docs, CFG, W).collect())
    f2 = sorted(r["fp_hash"] for r in winnow_fingerprints(docs, CFG, W).collect())
    assert f1 == f2
