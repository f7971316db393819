"""Connected components via iterative hash-min label propagation.

The reference has no clustering stage (its retrieval returns ranked
candidate lists per query, ``lsh.py:459-473``); clustering duplicate groups
is the dedup-engine generalization mandated by BASELINE.json north_star
("clustered with an iterative connected-components (hash-min label
propagation) join loop").

Scale notes (SURVEY.md §7.4 item 2):
 * each iteration is join(edges, labels) + groupBy min — two shuffles;
 * lineage is truncated every iteration with localCheckpoint, otherwise the
   logical plan doubles per iteration and Catalyst re-optimization time
   explodes (the one place lazy plans actively hurt);
 * convergence is detected by counting changed labels (an aggregate, no
   collect of the label table);
 * iteration count is bounded by graph diameter; duplicate clusters are
   near-cliques so it converges in 2-4 rounds in practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(pairs: DataFrame, max_iter: int = 50,
                         small_graph_partitions: int = 8,
                         small_graph_edges: int = 2_000_000,
                         store=None, stage_prefix: str = "cc") -> DataFrame:
    """(doc_a, doc_b) edges → (doc_id, cluster_id) with cluster_id = min
    member. Singletons are not emitted (docs absent from ``pairs`` are their
    own cluster by definition).

    Verified-duplicate edge sets are typically tiny relative to the corpus
    (clusters are near-cliques of 2-5 docs); when the edge count is below
    ``small_graph_edges`` the loop runs on ``small_graph_partitions``
    partitions so each iteration is a handful of tasks instead of
    shuffle_partitions-many — the per-iteration scheduling overhead is the
    serial term of the whole pipeline's Amdahl fraction. Above the cutoff
    the natural partitioning is kept (the 10^12-turn path).

    ``store`` (plans/checkpoint.CheckpointStore): when given, the LABEL
    STATE itself is committed per iteration as stage
    ``{stage_prefix}_iter{n}`` (north_rule: "component state to Iceberg
    for resumable runs") — a killed run resumes label propagation from the
    last committed iteration instead of restarting the loop. At 10^12
    turns an iteration is a multi-TB shuffle; re-running converged
    iterations is the single most expensive kind of lost work.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(pairs.select(F.col("doc_b").alias("src"),
                                  F.col("doc_a").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    if edges.count() <= small_graph_edges:
        edges = edges.coalesce(small_graph_partitions).localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint()
    )
    start_iter = 0
    if store is not None:
        spark = pairs.sparkSession
        for i in range(max_iter, 0, -1):
            if store.exists(f"{stage_prefix}_iter{i}", spark):
                labels = store.read(spark, f"{stage_prefix}_iter{i}")
                start_iter = i
                break
    for _it in range(start_iter, max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.src, "left")
            .select(
                "doc_id",
                F.least(F.col("cluster_id"),
                        F.coalesce(F.col("nbr_min"), F.col("cluster_id")))
                 .alias("cluster_id"),
                (F.col("nbr_min") < F.col("cluster_id")).alias("changed"),
            )
        )
        new_labels = new_labels.localCheckpoint()
        changed = new_labels.filter(F.col("changed")).limit(1).count()
        labels = new_labels.drop("changed")
        if store is not None:
            labels = store.write(labels, f"{stage_prefix}_iter{_it + 1}")
        if changed == 0:
            break
    return labels


def clusters_with_members(labels: DataFrame) -> DataFrame:
    """(cluster_id, members array, size) summary."""
    return (
        labels.groupBy("cluster_id")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("members"),
             F.count("*").cast("long").alias("size"))
    )
