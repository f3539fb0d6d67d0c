"""Similarity search over embedding columns (`array<float>`).

Brute-force cosine top-k is the exact baseline; IVF (inverted-file)
probing is the scale path. Both are pure DataFrame compositions —
`zip_with`/`aggregate` keep the dot product JVM-side (no Python), and
all ranking is deterministic (rounded score, id tie-break) so results
are reproducible and oracle-comparable.

Scale notes (10^9-vector corpus):
* ``bruteforce_topk`` broadcasts the *query* side; cost is one full
  corpus scan per batch of queries — right answer for recall
  evaluation, wrong answer for serving.
* ``ivf_topk`` restricts each query to its nearest coarse cell: search
  cost ∝ |corpus| / n_cells × n_probe. The cell column here is the
  pre-assigned ``label`` (stand-in for a k-means coarse quantizer);
  centroids are computed from the data itself, so the operator works
  for any cell assignment. The corpus-side join key (cell) is exactly
  the storage partition key at scale — probing touches only the
  partitions of the probed cells (partition pruning, no shuffle of the
  corpus).
* Floating-point: all math in double; ordering uses ``round(cs, 6)``
  with id tie-break so rank boundaries don't flap on summation-order
  ulps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _ranked_topk(
    scored: DataFrame, k: int, partition_cols: list[str], extra_cols: list[str]
) -> DataFrame:
    w = Window.partitionBy(*partition_cols).orderBy(
        F.round(F.col("cs"), 6).desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            *partition_cols,
            *extra_cols,
            "neighbor_id",
            F.round(F.col("cs"), 4).alias("cos_sim"),
            "rank",
        )
    )


def bruteforce_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos_sim, rank).

    The query set is broadcast (it's small by construction); the corpus
    is scanned once — a map-only stage followed by a per-query top-k.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cs"))
    )
    out = _ranked_topk(scored, k, ["query_id"], [])
    return out.select("query_id", "neighbor_id", "cos_sim", "rank")


def cell_centroids(
    corpus: DataFrame,
    cell_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Elementwise-mean centroid per cell: (cell, centroid array<double>).

    posexplode → per-(cell, pos) avg → reassemble ordered by pos. One
    shuffle keyed on (cell, pos); centroid count = n_cells, tiny.
    """
    comp = (
        corpus.select(cell_col, F.posexplode(_as_double(F.col(vec_col))).alias("pos", "x"))
        .groupBy(cell_col, "pos")
        .agg(F.avg("x").alias("avgv"))
    )
    return comp.groupBy(cell_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "avgv"))), lambda s: s.avgv
        ).alias("centroid")
    )


def train_kmeans_cells(
    corpus: DataFrame,
    n_cells: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_fraction: float = 1.0,
) -> DataFrame:
    """Spherical k-means coarse quantizer as DataFrame iterations:
    returns (id, cell) — the trained IVF cell assignment.

    Deterministic end to end: init = the ``n_cells`` lowest-id vectors
    (cell ids in id order), assignment = argmax cosine with
    ``round(·, 6)`` + cell-id tie-break, centroids = element-wise member
    mean. Cells that lose all members drop out (no re-seeding) — same
    rule a SQL oracle reproduces. Each iteration is one broadcast
    crossJoin (|corpus| × n_cells score rows) plus one (cell, pos)
    aggregate; only the n_cells centroids ever reach the driver.

    ``train_fraction < 1`` is the 10^9-vector path: the iteration loop
    runs on a deterministic hash-gated sample (``xxhash64(id) mod 10^6 <
    fraction·10^6`` — no RNG, replay-stable), then ONE final assignment
    pass tags the FULL corpus with the trained centroids. Training cost
    drops to O(|corpus|·fraction·n_iter) + one full pass; the quantizer
    quality degrades gracefully (centroids are means — a uniform sample
    estimates them with √(1/fraction) noise). ``train_fraction=1``
    keeps the exact legacy output (the SQL-oracle contract path).
    """
    spark = corpus.sparkSession
    vecs = corpus.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    train = vecs
    if train_fraction < 1.0:
        gate = int(train_fraction * 1_000_000)
        train = vecs.filter(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(1_000_000)) < F.lit(gate)
        )
    init = train.orderBy(id_col).limit(n_cells).collect()
    cents = [(i, list(r["v"])) for i, r in enumerate(init)]
    aw = Window.partitionBy(id_col).orderBy(
        F.round(F.col("ccs"), 6).desc(), F.col("cell").asc()
    )

    def _assign(frame: DataFrame, cdf: DataFrame) -> DataFrame:
        return (
            frame.crossJoin(cdf)
            .select(
                id_col, "v", "cell", cosine(F.col("v"), F.col("centroid")).alias("ccs")
            )
            .withColumn("rn", F.row_number().over(aw))
            .filter(F.col("rn") == 1)
            .select(id_col, "v", "cell")
        )

    assign, cdf = None, None
    for _ in range(n_iter):
        cdf = F.broadcast(
            spark.createDataFrame(cents, "cell int, centroid array<double>")
        )
        assign = _assign(train, cdf)
        new_cents = (
            assign.select("cell", F.posexplode(F.col("v")).alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("avgv"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "avgv"))),
                    lambda s: s.avgv,
                ).alias("centroid")
            )
            .collect()
        )
        cents = sorted((r["cell"], list(r["centroid"])) for r in new_cents)
    if train_fraction < 1.0:
        # tag the full corpus with the same centroid table the sample's
        # final assignment used — parallel semantics to the exact path
        assign = _assign(vecs, cdf)
    return assign.select(id_col, "cell")


def ivf_trained_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_cells: int = 8,
    n_iter: int = 2,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_fraction: float = 1.0,
) -> DataFrame:
    """IVF with a TRAINED k-means quantizer instead of a pre-assigned
    label column: train cells, tag the corpus, then probe exactly like
    ``ivf_topk`` (centroids re-derived as member means of the final
    assignment, which is one more k-means half-step — and what makes
    the DuckDB oracle a mechanical unroll). ``train_fraction < 1``
    trains the quantizer on a deterministic sample (the 10^9-vector
    path; see ``train_kmeans_cells``)."""
    cells = train_kmeans_cells(
        corpus, n_cells, n_iter, id_col, vec_col, train_fraction=train_fraction
    )
    tagged = corpus.join(cells, id_col).withColumnRenamed("cell", "_ivf_cell")
    return ivf_topk(
        tagged, queries, k=k, id_col=id_col, vec_col=vec_col,
        cell_col="_ivf_cell", n_probe=n_probe,
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    n_probe: int = 1,
) -> DataFrame:
    """IVF ANN: assign each query to its ``n_probe`` nearest centroid
    cells, then exact top-k within those cells only (recall/cost knob —
    search cost ∝ |corpus| × n_probe / n_cells).

    Returns (query_id, probe_cell, neighbor_id, cos_sim, rank); for
    n_probe > 1, probe_cell is the cell the neighbor was found in.
    """
    cents = F.broadcast(
        cell_centroids(corpus, cell_col, vec_col).select(
            F.col(cell_col).alias("probe_cell"), "centroid"
        )
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    aw = Window.partitionBy("query_id").orderBy(
        F.round(F.col("ccs"), 6).desc(), F.col("probe_cell").asc()
    )
    assign = (
        q.crossJoin(cents)
        .select(
            "query_id", "qv", "probe_cell",
            cosine(F.col("qv"), F.col("centroid")).alias("ccs"),
        )
        .withColumn("rn", F.row_number().over(aw))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", "probe_cell")
    )
    c = corpus.select(
        F.col(cell_col).alias("probe_cell"),
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    )
    scored = (
        F.broadcast(assign)
        .join(c, "probe_cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "probe_cell", "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cs"),
        )
    )
    out = _ranked_topk(scored, k, ["query_id"], ["probe_cell"])
    return out.select("query_id", "probe_cell", "neighbor_id", "cos_sim", "rank")
