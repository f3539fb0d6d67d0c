"""Persisted IVF index — similarity search as a BUILD-ONCE artifact.

``operators/similarity.ivf_trained_topk`` retrains the quantizer on
every call; real serving builds the index once and probes it many
times. ``IvfIndex.build`` trains the spherical k-means quantizer
(``train_kmeans_cells`` — deterministic, sample-trainable), tags the
corpus, and persists:

    <root>/meta.json                   params + counts (atomic publish)
    <root>/centroids/                  (cell, centroid) parquet, tiny
    <root>/corpus/cell=<c>/*.parquet   corpus rows partitioned by cell

``probe`` assigns queries to their ``n_probe`` nearest centroids from
the broadcast centroid table, then scans ONLY the probed cells'
partition directories (Hive-style partition pruning on ``cell=``, the
physical realization of "IVF probes touch 1/n_cells of the corpus").
Output is column-identical to ``ivf_topk`` / ``ivf_trained_topk`` and
bit-equal to an unpersisted ``ivf_trained_topk`` run with the same
params (differential-tested) — persistence must not change results.

At 10^9 vectors the corpus copy under the index root is the standard
IVF trade (an inverted file IS a cell-clustered copy); incremental
adds go to their assigned cell's directory without touching others.

IVF-PQ (``build(..., pq_m=...)``): the index additionally trains
product-quantization codebooks (operators/pq.py) and stores every
vector's m codes as a column NEXT TO the float embedding in the same
parquet — ``probe_adc`` then selects only (id, codes), so parquet
column pruning keeps the float vectors unread at serve time (the
IVF-PQ promise: probe cost = pruned cells × m byte-codes). The PQ
codebook freezes at build like the coarse centroids; ``add`` encodes
new vectors with it.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datax_spark.operators.similarity import (
    _as_double,
    _ranked_topk,
    cell_centroids,
    cosine,
    train_kmeans_cells,
)

FORMAT = "ivf-index/1"


class IvfIndex:
    def __init__(self, spark: SparkSession, root: str | Path):
        self.spark = spark
        self.root = Path(root)
        meta_path = self.root / "meta.json"
        if not meta_path.exists():
            raise FileNotFoundError(f"no IVF index at {self.root}")
        self.meta = json.loads(meta_path.read_text())
        if self.meta.get("format") != FORMAT:
            raise ValueError(f"unknown index format {self.meta.get('format')!r}")
        # cached query→cell assignments of the LATEST probe (see
        # _track_assign): bounds cache growth on long-lived sessions
        self._live_assign: DataFrame | None = None

    def _track_assign(self, assign: DataFrame) -> DataFrame:
        """Register a probe's persisted assignment frame, evicting the
        previous probe's. The cache exists so the in-method collect()
        (probed-cell list) and the returned plan share one
        queries×centroids crossJoin; keeping only the latest bounds a
        long-lived serving session at one assignment's blocks instead of
        accumulating one per probe call. The evicted frame stays
        CORRECT for any still-held result plan — it just recomputes."""
        if self._live_assign is not None:
            self._live_assign.unpersist(blocking=False)
        self._live_assign = assign
        return assign

    # ---------------- build ---------------- #
    @staticmethod
    def build(
        corpus: DataFrame,
        root: str | Path,
        n_cells: int = 8,
        n_iter: int = 2,
        train_fraction: float = 1.0,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        pq_m: int | None = None,
        pq_codes: int = 8,
        pq_dim: int | None = None,
    ) -> "IvfIndex":
        """Train + tag + persist. The meta.json write is last (publish
        point): a crashed build leaves no loadable index. ``pq_m`` turns
        on IVF-PQ: per-subspace codebooks of ``pq_codes`` codewords over
        ``pq_dim``-dim vectors, codes stored beside the floats."""
        root = Path(root)
        spark = corpus.sparkSession
        cells = train_kmeans_cells(
            corpus, n_cells, n_iter, id_col, vec_col, train_fraction=train_fraction
        )
        tagged = corpus.join(cells, id_col).select(
            F.col(id_col), _as_double(F.col(vec_col)).alias(vec_col), "cell"
        )
        if pq_m is not None:
            from datax_spark.operators.pq import pq_encode, train_pq

            if pq_dim is None:
                raise ValueError("pq_m requires pq_dim")
            cb = train_pq(corpus, pq_m, pq_codes, n_iter, pq_dim, id_col, vec_col)
            cb.write.mode("overwrite").parquet(str(root / "pq_codebook"))
            codes = pq_encode(corpus, cb, pq_m, pq_dim, id_col, vec_col)
            tagged = tagged.join(codes, id_col)
        tagged.write.mode("overwrite").partitionBy("cell").parquet(
            str(root / "corpus")
        )
        tagged_back = spark.read.parquet(str(root / "corpus"))
        cents = cell_centroids(tagged_back, "cell", vec_col)
        cents.coalesce(1).write.mode("overwrite").parquet(str(root / "centroids"))
        n_rows = tagged_back.count()
        (root / "meta.json").write_text(
            json.dumps(
                {
                    "format": FORMAT,
                    "n_cells": n_cells,
                    "n_iter": n_iter,
                    "train_fraction": train_fraction,
                    "id_col": id_col,
                    "vec_col": vec_col,
                    "rows": n_rows,
                    "pq": None if pq_m is None else {
                        "m": pq_m, "k_codes": pq_codes, "dim": pq_dim,
                    },
                },
                indent=2,
            )
        )
        return IvfIndex(spark, root)

    def add(self, new_vectors: DataFrame) -> int:
        """Incremental index growth: assign new vectors to their nearest
        EXISTING centroid (centroids stay frozen — standard IVF: lists
        grow, the quantizer doesn't move, so old probe routes stay
        valid) and append them to exactly their cells' partition
        directories. Returns the number of rows added. Rebuild when
        drift makes frozen cells unbalanced — the meta row count vs
        build-time count is the drift signal."""
        id_col, vec_col = self.meta["id_col"], self.meta["vec_col"]
        cents = F.broadcast(
            self.centroids().select("cell", "centroid")
        )
        aw = Window.partitionBy(id_col).orderBy(
            F.round(F.col("ccs"), 6).desc(), F.col("cell").asc()
        )
        tagged = (
            new_vectors.select(
                F.col(id_col), _as_double(F.col(vec_col)).alias(vec_col)
            )
            .crossJoin(cents)
            .select(
                id_col, vec_col, "cell",
                cosine(F.col(vec_col), F.col("centroid")).alias("ccs"),
            )
            .withColumn("rn", F.row_number().over(aw))
            .filter(F.col("rn") == 1)
            .select(id_col, vec_col, "cell")
        )
        if self.meta.get("pq"):
            from datax_spark.operators.pq import pq_encode

            pq = self.meta["pq"]
            codes = pq_encode(
                new_vectors, F.broadcast(self.pq_codebook()),
                pq["m"], pq["dim"], id_col, vec_col,
            )
            tagged = tagged.join(codes, id_col)
        tagged = tagged.persist()  # count + write: one assignment job, not two
        n = tagged.count()
        tagged.write.mode("append").partitionBy("cell").parquet(
            str(self.root / "corpus")
        )
        tagged.unpersist()
        self.meta["rows"] = int(self.meta["rows"]) + n
        (self.root / "meta.json").write_text(json.dumps(self.meta, indent=2))
        return n

    # ---------------- read side ---------------- #
    def centroids(self) -> DataFrame:
        return self.spark.read.parquet(str(self.root / "centroids"))

    def pq_codebook(self) -> DataFrame:
        if not self.meta.get("pq"):
            raise ValueError(f"index at {self.root} was built without PQ")
        return self.spark.read.parquet(str(self.root / "pq_codebook"))

    def corpus(self, cells: list[int] | None = None) -> DataFrame:
        df = self.spark.read.parquet(str(self.root / "corpus"))
        if cells is not None:
            # partition filter on the Hive layout: only cell=<c> dirs
            # are listed/scanned
            df = df.filter(F.col("cell").isin([int(c) for c in cells]))
        return df

    def probe(
        self, queries: DataFrame, k: int = 3, n_probe: int = 1
    ) -> DataFrame:
        """(query_id, probe_cell, neighbor_id, cos_sim, rank) — same
        contract as similarity.ivf_topk, reading only probed cells."""
        id_col, vec_col = self.meta["id_col"], self.meta["vec_col"]
        cents = F.broadcast(
            self.centroids().select(F.col("cell").alias("probe_cell"), "centroid")
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
            # consumed twice (probed-cell collect + the scored join):
            # without the cache every probe pays the queries×centroids
            # crossJoin and its window twice
            .persist()
        )
        assign = self._track_assign(assign)
        # the probed cell set is ≤ n_cells — collect it so the corpus
        # scan becomes a partition-pruned read of exactly those dirs
        probed = sorted(
            r["probe_cell"] for r in assign.select("probe_cell").distinct().collect()
        )
        c = self.corpus(cells=probed).select(
            F.col("cell").alias("probe_cell"),
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
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

    def probe_adc(
        self, queries: DataFrame, k: int = 3, n_probe: int = 1,
        rerank: int | None = None,
    ) -> DataFrame:
        """IVF-PQ probe: coarse-assign queries to ``n_probe`` cells,
        then ADC-score ONLY the probed cells' (id, codes) columns — the
        float vectors in those files are never read (parquet column
        pruning). Output matches operators/pq.pq_topk:
        (query_id, neighbor_id, approx_dist, rank); with
        n_probe = n_cells it is bit-equal to the unpersisted pq_topk
        (differential-tested).

        ``rerank=R`` turns on the standard two-stage serving flow: the
        ADC pass shortlists the top R (R ≥ k) per query, then ONLY those
        R rows' float vectors are read back (a semi-join against the
        probed cells — R·|queries| rows, not a cell's worth) and exact
        cosine re-orders them into the final top-k. Output then carries
        ``cos_sim`` instead of ``approx_dist`` — quantization error
        affects the SHORTLIST, never the final ordering."""
        from datax_spark.operators.pq import adc_lut, adc_rank

        pq = self.meta.get("pq")
        if not pq:
            raise ValueError(f"index at {self.root} was built without PQ")
        id_col, vec_col = self.meta["id_col"], self.meta["vec_col"]
        m = pq["m"]

        cents = F.broadcast(
            self.centroids().select(F.col("cell").alias("probe_cell"), "centroid")
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
                "query_id", "probe_cell",
                cosine(F.col("qv"), F.col("centroid")).alias("ccs"),
            )
            .withColumn("rn", F.row_number().over(aw))
            .filter(F.col("rn") <= n_probe)
            .select("query_id", "probe_cell")
            .persist()
        )
        assign = self._track_assign(assign)
        probed = sorted(
            r["probe_cell"] for r in assign.select("probe_cell").distinct().collect()
        )

        lut = adc_lut(
            queries, F.broadcast(self.pq_codebook()), m, pq["dim"], id_col, vec_col
        )
        # codes-only scan of the probed cells: vec_col stays unread
        coded = self.corpus(cells=probed).select(
            F.col("cell").alias("probe_cell"),
            F.col(id_col).alias("neighbor_id"),
            F.posexplode("codes").alias("sub", "code"),
        )
        # a neighbor scores only against queries that probed its cell —
        # the only difference from pq_topk; the scoring tail is shared
        # (adc_rank) so the two stay bit-identical by construction
        joined = (
            F.broadcast(assign)
            .join(coded, "probe_cell")
            .join(lut, ["query_id", "sub", "code"])
            .select("query_id", "neighbor_id", "sub", "pd")
        )
        if rerank is None:
            return adc_rank(joined, m, k)
        if rerank < k:
            raise ValueError(f"rerank={rerank} must be >= k={k}")
        shortlist = adc_rank(joined, m, rerank).select("query_id", "neighbor_id")
        floats = self.corpus(cells=probed).select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
        )
        rw = Window.partitionBy("query_id").orderBy(
            F.round(F.col("cs"), 6).desc(), F.col("neighbor_id").asc()
        )
        return (
            F.broadcast(shortlist)
            .join(floats, "neighbor_id")
            .join(q, "query_id")
            .select(
                "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cs")
            )
            .withColumn("rank", F.row_number().over(rw).cast("bigint"))
            .filter(F.col("rank") <= k)
            .select(
                "query_id", "neighbor_id", F.round(F.col("cs"), 4).alias("cos_sim"),
                "rank",
            )
        )
