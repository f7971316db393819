"""End-to-end dedup pipeline: recall on golden pairs, precision, resume."""

from __future__ import annotations

from pyspark.sql import functions as F

from lsh_spark.config import DedupConfig
from lsh_spark.plans.pipeline import dedup_pipeline, dedup_keep_list
from lsh_spark.plans.checkpoint import CheckpointStore
from lsh_spark.canonicalize import conversation_docs


def _cluster_map(labels):
    return {r["doc_id"]: r["cluster_id"] for r in labels.collect()}


def test_pipeline_recall_and_precision(spark, t1_transcripts, t1_labels):
    cfg = DedupConfig()
    lab = _cluster_map(dedup_pipeline(spark, t1_transcripts, cfg))
    golden = t1_labels.collect()

    # recall over pairs the configured thresholds are supposed to catch:
    # jaccard >= threshold (MinHash pass) or substring mutation (gram pass)
    eligible = [g for g in golden
                if g["jaccard_true"] >= cfg.jaccard_threshold
                or g["mutation"] == "substring"]
    assert eligible
    caught = sum(1 for g in eligible
                 if lab.get(g["conv_id_a"]) is not None
                 and lab.get(g["conv_id_a"]) == lab.get(g["conv_id_b"]))
    assert caught / len(eligible) >= 0.99

    # precision: no cluster may merge two different golden groups
    base_of = {}
    for g in golden:
        base_of[g["conv_id_a"]] = g["cluster_id"]
        base_of[g["conv_id_b"]] = g["cluster_id"]
    groups_per_cluster = {}
    for doc, cl in lab.items():
        if doc in base_of:
            groups_per_cluster.setdefault(cl, set()).add(base_of[doc])
    assert all(len(gs) == 1 for gs in groups_per_cluster.values())


def test_keep_list_covers_all_docs_once(spark, t1_transcripts):
    cfg = DedupConfig()
    labels = dedup_pipeline(spark, t1_transcripts, cfg)
    docs = conversation_docs(t1_transcripts)
    keep = dedup_keep_list(labels, docs)
    n_docs = docs.count()
    n_clustered = labels.count()
    n_clusters = labels.select("cluster_id").distinct().count()
    assert keep.count() == n_docs - n_clustered + n_clusters
    assert keep.distinct().count() == keep.count()


def test_checkpoint_resume_identical(spark, t1_transcripts, tmp_path):
    cfg = DedupConfig()
    store1 = CheckpointStore(str(tmp_path / "ck"), run_id="run1")
    first = _cluster_map(dedup_pipeline(spark, t1_transcripts, cfg, store=store1))

    # simulate a crash after the minhash pass: drop later stages, resume
    import shutil, os
    for stage in ("edges_simhash", "edges_substring", "clusters"):
        p = os.path.join(str(tmp_path / "ck"), stage)
        if os.path.exists(p):
            shutil.rmtree(p)
    store2 = CheckpointStore(str(tmp_path / "ck"), run_id="run2")
    resumed = _cluster_map(dedup_pipeline(spark, t1_transcripts, cfg, store=store2))
    assert first == resumed

    # lineage/metrics exist for reused stages
    lin = store2.read_lineage(spark, "edges_minhash").collect()
    assert lin and all(r["_run_id"] == "run1" for r in lin)


def test_pipeline_emits_reorder_and_exact_clusters(spark, t1_transcripts, t1_labels):
    lab = _cluster_map(dedup_pipeline(spark, t1_transcripts, DedupConfig()))
    for g in t1_labels.filter(F.col("mutation").isin("exact", "reorder")).collect():
        assert lab[g["conv_id_a"]] == lab[g["conv_id_b"]]
