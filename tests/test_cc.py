"""Connected components: known graphs → known components."""

from __future__ import annotations

from lsh_spark.operators.connected_components import (
    clusters_with_members, connected_components)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "doc_a string, doc_b string")
    return {r["doc_id"]: r["cluster_id"]
            for r in connected_components(df).collect()}


def test_two_components(spark):
    got = _cc(spark, [("a", "b"), ("b", "c"), ("x", "y")])
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_chain_graph_converges(spark):
    """Worst-case diameter: a long path must still converge (hash-min
    propagates one hop per iteration through the min side, but the least
    label flows transitively via localCheckpoint'd iterations)."""
    n = 24
    edges = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(n)]
    got = _cc(spark, edges)
    assert set(got.values()) == {"n00"}
    assert len(got) == n + 1


def test_cycle_and_duplicate_edges(spark):
    got = _cc(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "a")])
    assert got == {"a": "a", "b": "a", "c": "a"}


def test_cluster_summary(spark):
    df = spark.createDataFrame([("a", "b"), ("x", "y"), ("y", "z")],
                               "doc_a string, doc_b string")
    labels = connected_components(df)
    summary = {r["cluster_id"]: (r["members"], r["size"])
               for r in clusters_with_members(labels).collect()}
    assert summary["a"] == (["a", "b"], 2)
    assert summary["x"] == (["x", "y", "z"], 3)


# ---- VERDICT r3 #8: alternating large-star/small-star (O(log d)) --------

def _cc_star(spark, edges, max_rounds=30):
    from lsh_spark.operators.connected_components import \
        connected_components_star
    df = spark.createDataFrame(edges, "doc_a string, doc_b string")
    return {r["doc_id"]: r["cluster_id"]
            for r in connected_components_star(df,
                                               max_rounds=max_rounds).collect()}


def test_star_matches_hashmin_on_known_graphs(spark):
    for edges in (
        [("a", "b"), ("b", "c"), ("x", "y")],
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "a")],
        [("a", "b")],
    ):
        assert _cc_star(spark, edges) == _cc(spark, edges)


def test_star_chain_converges_in_log_rounds(spark):
    """64-node path (diameter 63): hash-min needs ~diameter iterations;
    the star rewrites must finish within ~log2(d) + slack rounds — with
    max_rounds=8 a slower-than-log algorithm would exit unconverged and
    produce wrong labels."""
    n = 64
    edges = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(n - 1)]
    got = _cc_star(spark, edges, max_rounds=8)
    assert set(got.values()) == {"n00"}
    assert len(got) == n


def test_star_property_random_graphs(spark):
    """Property: identical component maps to hash-min on random graphs
    (mixed chains, cliques, singleton pairs, shuffled ids)."""
    import random
    rng = random.Random(29)
    for trial in range(4):
        ids = [f"d{rng.randrange(10_000):04d}" for _ in range(40)]
        edges = [(rng.choice(ids), rng.choice(ids)) for _ in range(45)]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        assert _cc_star(spark, edges) == _cc(spark, edges), (trial, edges)
