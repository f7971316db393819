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
