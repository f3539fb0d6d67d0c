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


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """(node, component) over the undirected graph, component = the
    minimum node id of the component — via ALTERNATING LARGE-STAR /
    SMALL-STAR contraction (Kiveris et al. 2014, "Connected Components
    in MapReduce and Beyond").

    Why not min-label propagation (operators/dedup.near-dup clusters):
    label propagation needs diameter-many rounds — right for near-dup
    clusters (diameter ≲ 4 by construction), wrong for a WEB graph,
    where chains of redirects/paginated archives give long paths. Star
    contraction halves path lengths every pair of rounds and provably
    converges in O(log² n) rounds on ANY topology, each round being two
    bounded shuffles (a groupBy(min) and an explode-join — never an
    adjacency matrix, never all-pairs).

    large-star(u): every neighbor v > u re-attaches to m(u) = min of
    u's closed neighborhood. small-star(u): every neighbor v ≤ u (and u
    itself) attaches to that minimum. Both preserve connectivity; their
    alternation contracts every component to a star whose center is the
    component minimum. Convergence is detected by an edge-set checksum
    (order-independent sum of pair hashes + count — one tiny aggregate
    per round), so the loop stops as soon as the graph is all stars
    rather than running a worst-case round budget."""
    e0 = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
    )
    nodes = (
        e0.select(F.col("u").alias("node"))
        .unionByName(e0.select(F.col("v").alias("node")))
        .distinct()
        .persist()
    )

    def _checksum(pairs: DataFrame):
        row = pairs.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal sum: an int64 hash sum overflows ANSI long math
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    def _large_star(pairs: DataFrame) -> DataFrame:
        b = pairs.select("u", "v").unionByName(
            pairs.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = (
            b.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", F.col("u")).alias("m"))
        )
        return (
            b.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("m").alias("u"), F.col("v").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
            .distinct()
        )

    def _small_star(pairs: DataFrame) -> DataFrame:
        # orient every edge high → low, then each node links its ≤-self
        # neighborhood (self included) to that neighborhood's minimum
        b = pairs.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = b.groupBy("u").agg(F.min("v").alias("m"))
        out = (
            b.join(m, "u")
            .select(F.col("m").alias("nu"), F.col("v").alias("nv"))
            .unionByName(
                m.select(F.col("m").alias("nu"), F.col("u").alias("nv"))
            )
            .filter(F.col("nu") != F.col("nv"))
            .select(
                F.least("nu", "nv").alias("u"), F.greatest("nu", "nv").alias("v")
            )
            .distinct()
        )
        return out

    # localCheckpoint (not persist): persist truncates EXECUTION but the
    # logical plan still nests per round — by ~15 rounds the driver OOMs
    # analyzing it. Checkpointing cuts the lineage so every round plans
    # against a materialized edge set.
    cur = e0.localCheckpoint(eager=True)
    prev_sum = _checksum(cur)
    for _ in range(max_rounds):
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        new_sum = _checksum(nxt)
        cur = nxt
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    # at fixpoint every edge is (root, member): a member's single
    # neighbor is its component minimum; roots label themselves
    labels = (
        cur.select(F.col("v").alias("node"), F.col("u").alias("label"))
        .unionByName(cur.select(F.col("u").alias("node"), F.col("u").alias("label")))
        .groupBy("node")
        .agg(F.min("label").alias("component"))
    )
    out = nodes.join(labels, "node", "left").select(
        "node", F.coalesce("component", "node").alias("component")
    )
    res = out.localCheckpoint(eager=True)
    nodes.unpersist()
    return res


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
        # localCheckpoint, not persist: persist leaves the logical plan
        # nesting per iteration (driver analysis OOMs at high iteration
        # counts — same failure the CC loop hit); checkpointing replans
        # each iteration against materialized ranks
        ranks = ranks.localCheckpoint(eager=True)
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
    out = ranks
    if round_to is not None:
        out = out.select("node", F.round("rank", round_to).alias("rank"))
    return out
