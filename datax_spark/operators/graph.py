"""Web-graph operators — degree statistics and PageRank over an edge
list, the link-graph half of a crawl pipeline (harmonic/PageRank
centrality is a standard crawl-frontier prioritizer and quality signal;
Common Crawl publishes exactly these per-host ranks).

Edges are any (src, dst) DataFrame — e.g. ``functions/extract.py
extract_links`` over crawled HTML, collapsed to registrable hosts.

Scale shape per PageRank iteration (the textbook distributed form):
ONE equi-join of the edge list with the current rank vector (keyed on
src — co-partitioned with the edge list after the first iteration, so
AQE reuses the exchange) and ONE groupBy(dst) sum. Dangling mass (nodes
with no out-edges) folds back uniformly via a scalar aggregate —
driver-side, O(1) per iteration. Ranks stay (node, rank) — never
adjacency matrices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(node, out_deg, in_deg) — full outer across the two one-shuffle
    aggregates; nodes missing a side read 0."""
    out_d = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    in_d = edges.groupBy(F.col(dst).alias("node")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    return (
        out_d.join(in_d, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
        )
    )


def triangle_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """One row: (n_triangles, n_wedges, clustering) over the UNDIRECTED
    simple graph (direction dropped, self-loops dropped, parallel edges
    deduped). ``clustering`` is the global clustering coefficient
    3·triangles / wedges.

    Scale shape: triangles are counted once each via DEGREE-ORDERED
    orientation (every edge points low-degree → high-degree, ties by
    node id — the compact-forward ordering), so wedge enumeration is
    bounded by Σ_v d⁺(v)², where every out-degree is O(√m) even at a
    power-law hub: a celebrity host with 10⁶ undirected neighbors
    contributes O(m) oriented wedges, not O(deg²) = 10¹². The closing
    check is ONE hash equi-join of the wedge list against the canonical
    edge set — never an all-pairs product. Wedge totals come from the
    degree table alone (Σ C(d,2), no join)."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
    )
    w1 = oriented.select("s", F.col("t").alias("t1"))
    w2 = oriented.select("s", F.col("t").alias("t2"))
    wedges = w1.join(w2, "s").filter(F.col("t1") < F.col("t2"))
    # the wedge filter guarantees t1 < t2, matching e's (u < v) canon
    closed = wedges.join(
        e, (F.col("t1") == e["u"]) & (F.col("t2") == e["v"]), "inner"
    )
    tri = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
    wtot = deg.agg(
        (F.sum(F.col("deg") * (F.col("deg") - 1)) / 2)
        .cast("long")
        .alias("n_wedges")
    )
    return tri.crossJoin(wtot).select(
        "n_triangles",
        "n_wedges",
        # try_divide: a wedge-free graph (e.g. a perfect matching) has
        # no defined clustering coefficient — NULL, not a crash
        F.round(
            F.try_divide(3.0 * F.col("n_triangles"), F.col("n_wedges")), 4
        ).alias("clustering"),
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    round_to: int | None = 6,
) -> DataFrame:
    """(node, rank) after ``iterations`` synchronous power iterations,
    uniform start 1/N, dangling mass redistributed uniformly:

        rank'(v) = (1-d)/N + d·( Σ_{u→v} rank(u)/out(u) + dangling/N )

    Ranks sum to 1 every iteration. Deterministic — suitable for the
    SQL-oracle board (the oracle unrolls the same iterations)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    out_d = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(iterations):
        ranks = ranks.persist()
        with_out = ranks.join(
            out_d, ranks["node"] == out_d["src"], "left"
        ).select("node", "rank", "out_deg")
        # dangling mass: one scalar, O(1) to the driver
        dangling = (
            with_out.filter(F.col("out_deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contribs = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(out_d, "src")
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        prev = ranks
        base = (1.0 - damping) / n_nodes + damping * dangling / n_nodes
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        ranks = ranks.persist()
        ranks.count()
        prev.unpersist()
    out = ranks
    if round_to is not None:
        out = out.select("node", F.round("rank", round_to).alias("rank"))
    return out
