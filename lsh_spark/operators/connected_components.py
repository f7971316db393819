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
        # no second checkpoint: coalesce over the already-materialized
        # edge set is a narrow re-read, so each iteration pays a cheap
        # partition merge instead of the loop paying one extra full
        # materialization job up front
        edges = edges.coalesce(small_graph_partitions)
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


def connected_components_star(pairs: DataFrame, max_rounds: int = 30,
                              small_graph_partitions: int = 8,
                              small_graph_edges: int = 2_000_000,
                              store=None,
                              stage_prefix: str = "ccstar") -> DataFrame:
    """(doc_a, doc_b) edges → (doc_id, cluster_id) via alternating
    large-star / small-star rewrites (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14 — public algorithm).

    Hash-min label propagation moves labels ONE hop per iteration, so
    rounds scale with component diameter — fine for near-clique duplicate
    clusters, but containment/substring chains at 10^12 turns can be
    long.  The star rewrites contract paths doubly-exponentially:
    convergence in O(log diameter) alternating rounds.

     * large-star: per node u, hook every LARGER neighbor to
       m = min(N(u) ∪ {u});
     * small-star: per directed edge u→v with v < u, hook u and its
       smaller neighbors to their minimum;
     * converged when a round leaves the edge multiset fixed (checked
       with an order-insensitive count+hash signature aggregate — no
       collect, no anti-join).

    Semantics match ``connected_components`` exactly (same (doc_id,
    cluster_id = component min) contract, singletons not emitted) —
    property-tested equivalent in tests/test_cc.py.  ``store`` commits
    the edge state per round (stage ``{stage_prefix}_round{n}``) for
    resumable runs, mirroring the hash-min loop's label-state commits.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    if edges.count() <= small_graph_edges:
        # narrow re-read of the checkpoint, see connected_components
        edges = edges.coalesce(small_graph_partitions)

    members = (edges.select(F.col("src").alias("doc_id"))
               .unionByName(edges.select(F.col("dst").alias("doc_id")))
               .distinct()
               .localCheckpoint())

    def signature(e: DataFrame):
        # order-insensitive multiset signature; both stars emit the
        # canonical src > dst orientation so equality is well-defined.
        # decimal(38,0) accumulator: summing int64 hashes over 10^12
        # edges overflows long under ANSI mode
        row = e.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h")
        ).first()
        return row["n"], row["h"]

    def large_star(e: DataFrame) -> DataFrame:
        # per node u over the SYMMETRIZED neighborhood: hook every larger
        # neighbor to m = min(N(u) ∪ {u})
        sym = (e.unionByName(e.select(F.col("dst").alias("src"),
                                      F.col("src").alias("dst"))))
        m = (sym.groupBy("src")
             .agg(F.least(F.min("dst"), F.first("src")).alias("m")))
        return (sym.join(m, "src")
                .filter(F.col("dst") > F.col("src"))
                .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
                .filter(F.col("src") != F.col("dst"))
                .distinct())

    def small_star(e: DataFrame) -> DataFrame:
        # per node u over its SMALLER neighborhood (edges oriented
        # larger → smaller): hook u and all smaller neighbors to the min
        directed = (e.select(F.greatest("src", "dst").alias("src"),
                             F.least("src", "dst").alias("dst"))
                    .distinct())
        m = directed.groupBy("src").agg(F.min("dst").alias("m"))
        hooked = (directed.join(m, "src")
                  .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
                  .unionByName(m.select("src", F.col("m").alias("dst"))))
        return hooked.filter(F.col("src") != F.col("dst")).distinct()

    start_round = 0
    if store is not None:
        spark = pairs.sparkSession
        for i in range(max_rounds, 0, -1):
            if store.exists(f"{stage_prefix}_round{i}", spark):
                edges = store.read(spark, f"{stage_prefix}_round{i}")
                start_round = i
                break

    sig = signature(edges)
    converged = False
    for _round in range(start_round, max_rounds):
        edges = small_star(large_star(edges)).localCheckpoint()
        if store is not None:
            edges = store.write(edges, f"{stage_prefix}_round{_round + 1}")
        new_sig = signature(edges)
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        # ADVICE r4: labels derived from a non-converged edge set violate
        # the (doc_id, cluster_id = component min) contract — a node can
        # still appear as src of several edges with conflicting targets.
        # Never return them silently.
        raise RuntimeError(
            f"connected_components_star did not reach a fixed point within "
            f"max_rounds={max_rounds} (resumed at round {start_round}); "
            f"labels would be unsound — raise max_rounds (rounds needed "
            f"grow ~log2 of component diameter) or resume from the "
            f"checkpointed '{stage_prefix}_round*' state")

    # converged: every non-root points directly at its component min
    labels = edges.select(F.col("src").alias("doc_id"),
                          F.col("dst").alias("cluster_id"))
    roots = (members.join(labels, "doc_id", "left_anti")
             .select("doc_id", F.col("doc_id").alias("cluster_id")))
    return labels.unionByName(roots)


def clusters_with_members(labels: DataFrame) -> DataFrame:
    """(cluster_id, members array, size) summary."""
    return (
        labels.groupBy("cluster_id")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("members"),
             F.count("*").cast("long").alias("size"))
    )
