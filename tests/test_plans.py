"""Physical-plan assertions (SURVEY.md §4): pushdown, pruning, broadcast,
partial aggregation, semi-join — the Catalyst behaviors the engine relies
on at 100 TB, verified rather than assumed."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from lsh_spark.config import DedupConfig
from lsh_spark.operators import knn, lsh_bands, minhash, pairs, shingle, tfidf
from lsh_spark.canonicalize import conversation_docs


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_parquet_filter_pushdown_and_column_pruning(spark):
    df = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .filter(F.col("lang") == "en")
          .select("doc_id", "n_chars"))
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    # pruned scan: text column (the wide one) must not be read
    assert "text" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_knn_broadcasts_probe_side(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = knn.knn_bruteforce(emb, emb.filter(F.col("vec_id") < 5), k=3)
    assert "BroadcastExchange" in plan_of(df)


def test_tfidf_has_partial_aggregation(spark):
    docs = spark.createDataFrame([("d", "a b c")], "doc_id string, text string")
    plan = plan_of(tfidf.tf(docs))
    # map-side combine: partial_count before the exchange
    assert "partial_count" in plan


def test_conversation_docs_single_shuffle(spark, t1_transcripts):
    plan = plan_of(conversation_docs(t1_transcripts), "simple")
    # exactly one Exchange: the groupBy(conv_id); no Window/global sort,
    # map-side partial aggregation, and only 4 of 6 columns scanned
    assert plan.count("Exchange") == 1
    assert "Window" not in plan and "Sort " not in plan
    assert "partial_collect_list" in plan
    read_schema = plan.split("ReadSchema:")[1]
    assert "role" not in read_schema and "tool" not in read_schema


def test_verify_pairs_uses_semi_join_prefilter(spark):
    cfg = DedupConfig(num_perms=4)
    docs = spark.createDataFrame(
        [("a", "w1 w2 w3 w4 w5 w6"), ("b", "w1 w2 w3 w4 w5 w7")],
        "doc_id string, text string")
    hashes = shingle.doc_shingle_hashes(docs, cfg)
    sigs = minhash.minhash_signatures(hashes, cfg)
    bands = lsh_bands.band_buckets(sigs, cfg)
    cand = lsh_bands.candidate_pairs(bands, cfg, all_pairs=True)
    plan = plan_of(pairs.verify_pairs(cand, hashes, cfg), "extended")
    assert "LeftSemi" in plan


def test_band_buckets_no_python_udf(spark):
    """Banding must stay JVM-side (codegen), no Python in the hot path."""
    cfg = DedupConfig(num_perms=4)
    sigs = spark.createDataFrame([("a", [1, 2, 3, 4])],
                                 "doc_id string, sig array<bigint>")
    plan = plan_of(lsh_bands.band_buckets(sigs, cfg))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # '*' prefix marks whole-stage-codegen'd operators in formatted mode
    assert "* Generate" in plan and "* Project" in plan
