"""Link-graph operators: href extraction, host edge lists, degree
stats, and PageRank — differential against a pure-python power
iteration (the same formula, dict arithmetic)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datax_spark.functions.extract import extract_links, host_edges
from datax_spark.operators.graph import degree_stats, pagerank, triangle_stats

PAGES = [
    (
        "http://www.a.com/p1",
        '<html><a href="http://b.com/x">b</a>'
        ' <A HREF="http://c.com/y">c (uppercase attr)</A>'
        ' <a href="#frag">fragment-only: skipped</a>'
        " <a href='/rel'>relative: no host, dropped from edges</a></html>",
    ),
    ("http://b.com/p2", '<a class="z" href="http://a.com/q">a</a><a href="http://b.com/self">self-loop dropped</a>'),
    ("http://c.com/p3", "<p>no links at all</p>"),
]


def test_extract_links(spark):
    rows = {
        r["url"]: list(r["links"])
        for r in spark.createDataFrame(PAGES, ["url", "html"])
        .select("url", extract_links("html").alias("links"))
        .collect()
    }
    assert rows["http://www.a.com/p1"] == ["http://b.com/x", "http://c.com/y", "/rel"]
    assert rows["http://b.com/p2"] == ["http://a.com/q", "http://b.com/self"]
    assert rows["http://c.com/p3"] == []


def test_host_edges(spark):
    df = spark.createDataFrame(PAGES, ["url", "html"])
    edges = {(r["src"], r["dst"]) for r in host_edges(df).collect()}
    # www. stripped on the source side; relative links and self-loops drop
    assert edges == {("a.com", "b.com"), ("a.com", "c.com"), ("b.com", "a.com")}


def test_degree_stats(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "a"), ("c", "a"), ("c", "a")],
        ["src", "dst"],
    )
    got = {r["node"]: (r["out_deg"], r["in_deg"]) for r in degree_stats(e).collect()}
    assert got == {"a": (2, 3), "b": (1, 1), "c": (2, 1)}


def _py_pagerank(edges, iterations, damping=0.85):
    """Reference power iteration — same dangling-uniform formula."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        dangling = sum(r for v, r in rank.items() if v not in out)
        contrib = {v: 0.0 for v in nodes}
        for s, d in edges:
            contrib[d] += rank[s] / out[s]
        base = (1.0 - damping) / n + damping * dangling / n
        rank = {v: base + damping * contrib[v] for v in nodes}
    return rank


@pytest.mark.parametrize(
    "edges",
    [
        # chain with a dangling sink (d has no out-edges)
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")],
        # star + back-edges, multi-edges count as weight
        [("hub", "x"), ("hub", "y"), ("hub", "z"), ("x", "hub"), ("x", "hub"), ("y", "z")],
    ],
)
def test_pagerank_matches_reference(spark, edges):
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(e, iterations=8, round_to=None).collect()}
    want = _py_pagerank(edges, iterations=8)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_plan_no_cartesian(spark):
    e = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    plan = pagerank(e, iterations=2)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def _py_triangles(edges):
    import itertools

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = {v for e in und for v in e}
    adj = {v: set() for v in nodes}
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    tri = sum(
        1
        for a, b, c in itertools.combinations(sorted(nodes), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    wedges = sum(len(n) * (len(n) - 1) // 2 for n in adj.values())
    return tri, wedges


@pytest.mark.parametrize(
    "edges",
    [
        # one triangle + a pendant
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")],
        # direction + parallel edges collapse; hub wedge fan, K4 inside
        [
            ("h", "x"), ("x", "h"), ("h", "y"), ("h", "z"), ("h", "w"),
            ("x", "y"), ("y", "z"), ("x", "z"), ("w", "q"),
        ],
        # no triangles at all (star)
        [("s", "1"), ("s", "2"), ("s", "3")],
    ],
)
def test_triangle_stats_matches_bruteforce(spark, edges):
    e = spark.createDataFrame(edges, ["src", "dst"])
    row = triangle_stats(e).collect()[0]
    tri, wedges = _py_triangles(edges)
    assert (row["n_triangles"], row["n_wedges"]) == (tri, wedges)
    if wedges:
        assert row["clustering"] == pytest.approx(3.0 * tri / wedges, abs=1e-4)


def test_triangle_stats_orientation_invariance_and_plan(spark):
    # 40-node deterministic dense-ish graph: degree-ordered count
    # equals the brute-force count, and the plan has no cartesian
    edges = [
        (str(a), str(b))
        for a in range(25)
        for b in range(25)
        if a != b and (a * b + a + 3 * b) % 7 == 0
    ]  # 61 undirected edges, 56 triangles, 294 wedges
    e = spark.createDataFrame(edges, ["src", "dst"])
    out = triangle_stats(e)
    row = out.collect()[0]
    tri, wedges = _py_triangles(edges)
    assert (row["n_triangles"], row["n_wedges"]) == (tri, wedges)
    assert tri > 0  # the fixture must actually exercise the join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_triangle_stats_wedge_free_graph_null_clustering(spark):
    # perfect matching: no wedges — clustering is NULL, not a crash
    e = spark.createDataFrame([("a", "b"), ("c", "d")], ["src", "dst"])
    row = triangle_stats(e).collect()[0]
    assert (row["n_triangles"], row["n_wedges"]) == (0, 0)
    assert row["clustering"] is None


from hypothesis import given, settings, strategies as st


@settings(max_examples=15, deadline=None, derandomize=True)
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=0,
        max_size=40,
    )
)
def test_triangle_stats_property(spark, edges):
    rows = [(str(a), str(b)) for a, b in edges]
    if not any(a != b for a, b in rows):
        return  # empty simple graph: nothing to assert beyond no-crash
    e = spark.createDataFrame(rows, ["src", "dst"])
    row = triangle_stats(e).collect()[0]
    tri, wedges = _py_triangles(rows)
    assert (row["n_triangles"], row["n_wedges"]) == (tri, wedges)
