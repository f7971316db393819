"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not in this container, so the decode
kernels are STUBS (deterministic fakes / NotImplementedError), but the
Spark-side plumbing — schema, Arrow batch shape, partitioning, UDF
signatures — is real and tested: this is exactly the shape a 100 TB
media-dedup pass has (binary column → mapInPandas feature extraction →
embedding near-dup join).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

FEATURE_DIM = 16

MEDIA_SCHEMA = ("doc_id string, media binary, media_type string, "
                "width int, height int, duration_ms int")


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media payloads derived from text bytes (the
    sandbox stand-in for real image/audio columns). All derivations use the
    portable md5 hash so the whole frame is DuckDB-oracle-reproducible."""
    from lsh_spark.functions.hashing import portable_hash64
    h = portable_hash64(F.col("doc_id"))
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("media"),
        F.element_at(F.array(F.lit("image/png"), F.lit("audio/wav")),
                     (h % 2 + 1).cast("int")).alias("media_type"),
        (h % 640 + 1).cast("int").alias("width"),
        (h % 480 + 1).cast("int").alias("height"),
        (F.length("text") * 10).cast("int").alias("duration_ms"),
    )


def decode_media_real(payload: bytes, media_type: str):
    """The real decode hook. Wire PIL / torchaudio / pyav here on a real
    cluster."""
    raise NotImplementedError(
        "media decode requires PIL/pyav — not available in this image; "
        "extract_features uses the deterministic fake path")


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic 16-dim feature from the payload digest (stands in for
    a CNN/audio embedding; stable across runs and engines)."""
    digest = hashlib.sha256(payload).digest()
    arr = np.frombuffer(digest[:FEATURE_DIM * 2], dtype=np.uint16).astype(np.float64)
    return arr / 65535.0


def extract_features(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Real-cluster shape: repartition so each task holds a bounded number of
    payloads (media rows are MBs, not KBs — partition by bytes not rows),
    decode per batch, emit fixed-dim float arrays.
    Output: (doc_id, media_type, feature array<double>).
    """
    def worker(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            feats = [
                _fake_features(bytes(p)).tolist() if p is not None else None
                for p in pdf["media"]
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "feature": feats,
            })

    return media.select("doc_id", "media_type", "media").mapInPandas(
        worker, "doc_id string, media_type string, feature array<double>")


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame to decode —
    the distributed fan-out is real; the decode itself is the stub above.
    Output: (doc_id, frame_idx int, ts_ms int)."""
    n_frames = F.greatest(F.lit(1), (F.col("duration_ms") / every_ms).cast("int"))
    return media.select(
        "doc_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_"),
    ).select(
        "doc_id", F.col("frame_idx").cast("int"),
        (F.col("frame_idx") * every_ms).cast("int").alias("ts_ms"),
    )
