"""Structured-Streaming smoke: file-source exact dedup + windowed rates."""

from __future__ import annotations

import os
import shutil

from lsh_spark import synth
from lsh_spark.streaming import dedup_stream


def _stream_dir(tmp_path):
    src = synth.generate_tier("t1")
    d = str(tmp_path / "stream_in")
    os.makedirs(d, exist_ok=True)
    shutil.copy(src, os.path.join(d, "part-0.parquet"))
    return d


def test_streaming_exact_dedup(spark, tmp_path):
    stream = dedup_stream.read_transcript_stream(spark, _stream_dir(tmp_path))
    assert stream.isStreaming
    deduped = dedup_stream.streaming_exact_dedup(stream)
    q = (deduped.writeStream.format("memory").queryName("dedup_out")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        n_out = spark.sql("SELECT count(*) c FROM dedup_out").first()["c"]
        n_distinct = (spark.read.parquet(synth.generate_tier("t1"))
                      .selectExpr("md5(text) h").distinct().count())
        assert n_out == n_distinct
    finally:
        q.stop()


def test_streaming_turn_rates(spark, tmp_path):
    stream = dedup_stream.read_transcript_stream(spark, _stream_dir(tmp_path))
    agg = dedup_stream.streaming_turn_rates(stream)
    q = (agg.writeStream.format("memory").queryName("rates_out")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT sum(turns) t FROM rates_out").first()
        total = spark.read.parquet(synth.generate_tier("t1")).count()
        assert rows["t"] == total
    finally:
        q.stop()


def test_streaming_near_dup_flags(spark, tmp_path):
    """Exact-dup partner conversations (mutation 'exact') must be flagged
    as near-dup arrivals by the stateful band-bucket operator."""
    from pyspark.sql import functions as F

    from lsh_spark.config import DedupConfig
    stream = dedup_stream.read_transcript_stream(spark, _stream_dir(tmp_path))
    flags = dedup_stream.streaming_near_dup_flags(
        stream, DedupConfig(num_perms=8), watermark="10 seconds")
    q = (flags.writeStream.format("memory").queryName("neardup_out")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        out = spark.sql(
            "SELECT DISTINCT doc_id, dup_of FROM neardup_out").collect()
        flagged_pairs = {(r["doc_id"].split("#")[0], r["dup_of"].split("#")[0])
                         for r in out}
        convs = {a for a, b in flagged_pairs} | {b for a, b in flagged_pairs}
        # the t1 fixture plants exact duplicates c0000000 / c0000000d with
        # identical turn texts — their turns share every band bucket
        assert "c0000000" in convs and "c0000000d" in convs
        # flags are cross-document only
        assert all(r["doc_id"] != r["dup_of"] for r in out)
    finally:
        q.stop()
