"""CLI surface tests: the steady-state `ingest-delta` subcommand
(VERDICT r3 #6) and the crash-safe index fold-in ordering (ADVICE r3).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _split_fixture(spark, tmp_path):
    """Split the t1 fixture into base (index) and delta (new batch)
    transcripts: the delta is every conv that is a planted duplicate
    PARTNER, so every delta conv has a near-dup waiting in the index."""
    from lsh_spark import synth
    tr = spark.read.parquet(synth.generate_tier("t1"))
    labels = spark.read.parquet(synth.dup_labels_path("t1"))
    partners = {r["conv_id_b"] for r in labels.collect()}
    base_p, delta_p = str(tmp_path / "base"), str(tmp_path / "delta")
    tr.filter(~F.col("conv_id").isin(partners)).write.parquet(base_p)
    tr.filter(F.col("conv_id").isin(partners)).write.parquet(delta_p)
    return base_p, delta_p


@pytest.mark.slow
def test_cli_ingest_delta_flags_and_folds_index(spark, tmp_path):
    base_p, delta_p = _split_fixture(spark, tmp_path)
    ck = str(tmp_path / "ck")
    script = textwrap.dedent(f"""
        import sys; sys.path.insert(0, {REPO!r})
        from lsh_spark import cli
        for argv in (
            ["index", "--transcripts", {base_p!r}, "--checkpoint-dir",
             {ck!r}, "--cores", "4", "--num-perms", "16"],
            ["ingest-delta", "--delta", {delta_p!r}, "--checkpoint-dir",
             {ck!r}, "--cores", "4", "--num-perms", "16"],
        ):
            cli.main(argv)
    """)
    env = {**os.environ, "PYSPARK_PYTHON": sys.executable}
    res = subprocess.run([sys.executable, "-c", script], text=True,
                         capture_output=True, timeout=600, env=env)
    assert res.returncode == 0, res.stderr[-4000:]
    lines = [json.loads(ln) for ln in res.stdout.splitlines()
             if ln.startswith("{")]
    index_out = next(ln for ln in lines if ln.get("stage") == "band_buckets")
    delta_out = next(ln for ln in lines if ln.get("stage") == "ingest_delta")
    assert delta_out["batch_docs"] > 0
    # every delta conv has a planted partner in the index; high-jaccard
    # mutations must flag against it
    assert delta_out["vs_index"] > 0
    assert delta_out["dup_flags"] >= delta_out["vs_index"]
    # the batch was folded back in: the band index grew
    assert delta_out["index_rows"] > index_out["rows"]


def test_incremental_dedup_commits_hashes_before_bands(spark, tmp_path,
                                                       monkeypatch):
    """ADVICE r3: a crash between the two index writes must leave extra
    hashes (harmless), never bands without hashes (silently dropped
    candidates on the next delta) — so hashes commit FIRST."""
    from lsh_spark.config import DedupConfig
    from lsh_spark.operators import lsh_bands, minhash
    from lsh_spark.operators.shingle import doc_shingle_hashes_arrow
    from lsh_spark.plans.checkpoint import CheckpointStore
    from lsh_spark.plans.pipeline import incremental_dedup

    cfg = DedupConfig(num_perms=8, shingle_k=2)
    store = CheckpointStore(str(tmp_path / "ck"))
    corpus = spark.createDataFrame(
        [("c1", "a b c d e f"), ("c2", "x y z w v u")],
        "doc_id string, text string")
    hashes = doc_shingle_hashes_arrow(corpus, cfg)
    store.write(hashes, "shingle_hashes")
    store.write(lsh_bands.band_buckets(
        minhash.minhash_signatures(hashes, cfg), cfg), "band_buckets")

    order: list[str] = []
    real_write = CheckpointStore.write

    def spy(self, df, stage):
        order.append(stage)
        return real_write(self, df, stage)

    monkeypatch.setattr(CheckpointStore, "write", spy)
    batch = spark.createDataFrame([("n1", "a b c d e g")],
                                  "doc_id string, text string")
    incremental_dedup(spark, batch, store, cfg,
                      bands_stage="band_buckets",
                      hashes_stage="shingle_hashes").collect()
    assert order == ["shingle_hashes", "band_buckets"]
