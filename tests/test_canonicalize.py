"""Per-turn text equality under stable turn ordering (input_hint invariant)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lsh_spark.canonicalize import canonical_turns, conversation_docs, TURN_SEP


def test_canonical_order_restores_shuffled_rows(spark, t1_transcripts):
    shuffled = t1_transcripts.orderBy(F.xxhash64("conv_id", "turn_idx"))
    canon = canonical_turns(shuffled).select("conv_id", "turn_idx", "text")
    orig = t1_transcripts.select("conv_id", "turn_idx", "text")
    # byte-exact per-turn text equality, keyed by (conv_id, turn_idx)
    assert canon.exceptAll(orig).count() == 0
    assert orig.exceptAll(canon).count() == 0


def test_conversation_docs_are_order_invariant(spark, t1_transcripts):
    shuffled = t1_transcripts.orderBy(F.xxhash64("text"))
    d1 = conversation_docs(t1_transcripts).select("doc_id", "text")
    d2 = conversation_docs(shuffled).select("doc_id", "text")
    assert d1.exceptAll(d2).count() == 0


def test_reorder_mutation_doc_identical(spark, t1_transcripts, t1_labels):
    """A conv whose rows were written shuffled (mutation=reorder) must
    assemble to the byte-identical document of its base conv."""
    reorder = t1_labels.filter(F.col("mutation") == "reorder").first()
    docs = conversation_docs(t1_transcripts)
    texts = {r["doc_id"]: r["text"] for r in docs.filter(
        F.col("doc_id").isin(reorder["conv_id_a"], reorder["conv_id_b"])).collect()}
    assert texts[reorder["conv_id_a"]] == texts[reorder["conv_id_b"]]


def test_doc_assembly_uses_turn_sep(spark, t1_transcripts):
    docs = conversation_docs(t1_transcripts)
    row = docs.first()
    n_turns = row["n_turns"]
    assert row["text"].count(TURN_SEP) == n_turns - 1
