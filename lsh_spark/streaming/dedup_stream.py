"""Structured-Streaming incremental dedup (beyond-reference bonus).

The reference is strictly batch (SURVEY.md §2.10: no streams, watermarks or
state anywhere); BASELINE.json scopes streaming out of v1. This module adds
the minimal, honest streaming surface a transcript-ingest pipeline needs:
exact-dedup on arrival (content-hash dropDuplicates within a watermark) and
windowed ingest metrics. Tested with the file source + processAllAvailable
(synchronous drain) in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

TRANSCRIPT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("role", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("tool", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])


def read_transcript_stream(spark: SparkSession, path: str,
                           max_files_per_trigger: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_exact_dedup(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Drop turns whose text already arrived within the watermark window.

    Uses ``dropDuplicatesWithinWatermark`` (Spark 3.5+): dedup state for a
    hash is evicted once its event time falls behind the watermark, so
    state is genuinely bounded by the horizon — a turn may re-emit after
    the horizon passes (at-least-once dedup). Plain
    ``dropDuplicates(['text_hash'])`` would NOT bound state: Spark only
    evicts exact-dedup state when the event-time column is part of the
    dedup subset, so on a long-running stream that state grows forever.
    """
    return (
        stream.withWatermark("ts", watermark)
        .withColumn("text_hash", F.md5("text"))
        .dropDuplicatesWithinWatermark(["text_hash"])
    )


def streaming_turn_rates(stream: DataFrame, window: str = "1 minute",
                         watermark: str = "2 minutes") -> DataFrame:
    """Windowed ingest metrics: turns + distinct convs per window/role."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "role")
        .agg(F.count("*").alias("turns"),
             F.approx_count_distinct("conv_id").alias("approx_convs"))
    )
