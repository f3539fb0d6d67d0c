"""Star-contraction connected components (operators/graph.py
connected_components) — union-find differential, and the long-path case
that defeats bounded-round label propagation."""

from __future__ import annotations

import random

from datax_spark.operators.graph import connected_components


def _uf(edges):
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component id = min node id, matching the operator's convention
    return {n: find(n) for n in parent}


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }


def test_long_path_graph(spark):
    """A 300-node path has diameter 299: label propagation at any small
    round budget fails; star contraction must still converge."""
    edges = [(i, i + 1) for i in range(299)]
    got = _run(spark, edges)
    assert got == {i: 0 for i in range(300)}


def test_two_components_and_self_loops(spark):
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 11), (5, 5)]
    got = _run(spark, edges)
    # pure self-loop nodes carry no connecting edge: dropped with it
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 120
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(n // 2)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        assert _run(spark, edges) == _uf(edges), f"trial {trial}"


def test_star_and_empty(spark):
    assert _run(spark, [(50, i) for i in range(40)]) == {
        **{i: 0 for i in range(40)}, 50: 0
    }
    df = connected_components(
        _spark_empty(spark)
    )
    assert df.count() == 0


def _spark_empty(spark):
    return spark.createDataFrame([], "src long, dst long")
