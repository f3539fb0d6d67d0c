"""Link-graph operators: href extraction, host edge lists, degree
stats, and PageRank — differential against a pure-python power
iteration (the same formula, dict arithmetic)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datax_spark.functions.extract import extract_links, host_edges
from datax_spark.operators.graph import degree_stats, pagerank

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
