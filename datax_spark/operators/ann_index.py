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

FORMAT = "ivf-index/2"


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
        source: dict | None = None,
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
        tagged = tagged.withColumn("seg", F.lit(0))
        tagged.write.mode("overwrite").partitionBy("cell", "seg").parquet(
            str(root / "corpus")
        )
        tagged_back = spark.read.parquet(str(root / "corpus"))
        cents = cell_centroids(tagged_back, "cell", vec_col)
        cents.coalesce(1).write.mode("overwrite").parquet(str(root / "centroids"))
        n_rows = tagged_back.count()
        from datax_spark.operators.text_index import _write_meta

        meta = {
            "format": FORMAT,
            # read-side schema: a corpus compacted down to empty has
            # fileless cell dirs, unreadable by inference
            "corpus_schema": tagged.schema.json(),
            "n_cells": n_cells,
            "n_iter": n_iter,
            "train_fraction": train_fraction,
            "id_col": id_col,
            "vec_col": vec_col,
            "rows": n_rows,
            "built_rows": n_rows,  # frozen: drift_report's denominator
            "next_seg": 1,
            "pq": None if pq_m is None else {
                "m": pq_m, "k_codes": pq_codes, "dim": pq_dim,
            },
        }
        if source:
            meta["source"] = source
        _write_meta(root, meta)
        return IvfIndex(spark, root)

    @staticmethod
    def build_from_table(
        table,
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
        """Build from an IceTable's current state with a version cursor
        for ``sync`` — the Bm25Index.build_from_table contract, for
        vector corpora under CDC (embedding upserts/deletes)."""
        v = table.current_version()
        return IvfIndex.build(
            table.read(v).select(id_col, vec_col),
            root,
            n_cells=n_cells,
            n_iter=n_iter,
            train_fraction=train_fraction,
            id_col=id_col,
            vec_col=vec_col,
            pq_m=pq_m,
            pq_codes=pq_codes,
            pq_dim=pq_dim,
            source={"path": str(table.root), "version": v},
        )

    def add(self, new_vectors: DataFrame) -> int:
        """Incremental index growth: assign new vectors to their nearest
        EXISTING centroid (centroids stay frozen — standard IVF: lists
        grow, the quantizer doesn't move, so old probe routes stay
        valid) and append them to exactly their cells' partition
        directories. Returns the number of rows added. Rebuild when
        drift makes frozen cells unbalanced — the meta row count vs
        build-time count is the drift signal. Updates/deletes go
        through apply_changes/sync."""
        return self.apply_changes(None, new_vectors)["added"]

    def apply_changes(
        self,
        removed_ids: DataFrame | None,
        added_vectors: DataFrame | None,
        meta_extra: dict | None = None,
    ) -> dict:
        """One maintenance transaction, the Bm25Index contract: dead
        vectors tombstoned by id (their cell need not be known — the
        probe-side join is on id), changed/new vectors assigned to the
        FROZEN centroids (and PQ-encoded with the frozen codebooks) in
        one fresh segment. meta.json (atomic rename) is the commit
        point; a crashed transaction's segment+tombstones sit at
        >= next_seg and are invisible until the retry commits."""
        from datax_spark.operators.text_index import _write_meta

        id_col, vec_col = self.meta["id_col"], self.meta["vec_col"]
        seg = int(self.meta.get("next_seg", 1))
        n_rm = 0
        if removed_ids is not None:
            tomb = removed_ids.select(
                F.col(id_col), F.lit(seg).alias("before_seg")
            )
            n_rm = tomb.count()
            if n_rm:
                tomb.write.mode("append").parquet(str(self.root / "tombstones"))
        n_add = 0
        if added_vectors is not None:
            cents = F.broadcast(self.centroids().select("cell", "centroid"))
            aw = Window.partitionBy(id_col).orderBy(
                F.round(F.col("ccs"), 6).desc(), F.col("cell").asc()
            )
            tagged = (
                added_vectors.select(
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
                    added_vectors, F.broadcast(self.pq_codebook()),
                    pq["m"], pq["dim"], id_col, vec_col,
                )
                tagged = tagged.join(codes, id_col)
            # count + write: one assignment job, not two
            tagged = tagged.persist()
            n_add = tagged.count()
            (
                tagged.withColumn("seg", F.lit(seg))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("cell", "seg")
                .parquet(str(self._data_dir()))
            )
            tagged.unpersist()
        self.meta["rows"] = int(self.meta["rows"]) - n_rm + n_add
        self.meta["next_seg"] = seg + 1
        if meta_extra:
            self.meta.update(meta_extra)
        _write_meta(self.root, self.meta)
        return {"removed": n_rm, "added": n_add, "seg": seg}

    def sync(self, table, to_version: int | None = None) -> dict:
        """Advance the index to the vector table's state at
        ``to_version`` from the changelog since the stored cursor —
        maintenance cost scales with the changed vectors, not the
        corpus. probe(synced) ≡ probe(one-shot rebuild with the same
        frozen quantizer) is differential-tested; note the QUANTIZER
        stays the build-time one (standard IVF), so heavy drift still
        warrants a rebuild."""
        src = self.meta.get("source")
        if not src:
            raise ValueError(
                "index was not built with build_from_table — no cursor"
            )
        if str(table.root) != src["path"]:
            raise ValueError(
                f"index tracks {src['path']}, got table at {table.root}"
            )
        id_col, vec_col = self.meta["id_col"], self.meta["vec_col"]
        frm = int(src["version"])
        to = table.current_version() if to_version is None else int(to_version)
        if to < frm:
            raise ValueError(f"cursor at v{frm} is past requested v{to}")
        if to == frm:
            return {"removed": 0, "added": 0, "from": frm, "to": to}
        ch = table.read_changes(frm, to, pre_images=True).select(
            "_op", id_col, vec_col
        )
        out = self.apply_changes(
            ch.filter(F.col("_op").isin("D", "UB")).select(id_col),
            ch.filter(F.col("_op").isin("I", "UA")).drop("_op"),
            meta_extra={"source": {**src, "version": to}},
        )
        return {**out, "from": frm, "to": to}

    def purge_ids(self, ids) -> dict:
        """Physical erasure of the ids' vectors and codes (the
        Bm25Index purge_ids contract): count what is actually live,
        tombstone, fix the row count, compact immediately."""
        id_col = self.meta["id_col"]
        if not isinstance(ids, DataFrame):
            from pyspark.sql import types as T

            fields = T.StructType.fromJson(
                json.loads(self.meta["corpus_schema"])
            )
            idt = {f.name: f.dataType for f in fields}[id_col]
            ids = self.spark.createDataFrame(
                [(i,) for i in ids],
                T.StructType([T.StructField(id_col, idt)]),
            )
        ids = ids.select(id_col)
        n_rm = (
            self._live_corpus(None)
            .join(F.broadcast(ids), id_col, "left_semi")
            .select(id_col)
            .distinct()
            .count()
        )
        from datax_spark.operators.text_index import _write_meta

        seg = int(self.meta.get("next_seg", 1))
        if n_rm:
            ids.select(
                F.col(id_col), F.lit(seg).alias("before_seg")
            ).write.mode("append").parquet(str(self.root / "tombstones"))
        self.meta["rows"] = int(self.meta["rows"]) - n_rm
        self.meta["next_seg"] = seg + 1
        _write_meta(self.root, self.meta)
        self.compact()
        return {"purged": n_rm}

    def drift_report(self) -> dict:
        """Rebuild advisory for the frozen quantizer: live-row growth
        vs build time and cell-size imbalance. IVF quality degrades
        when churn reshapes the distribution the centroids were trained
        on — sync() keeps results CORRECT for what is indexed, but
        probe recall/cost balance drifts. One cheap aggregate over the
        live corpus (cells only — vectors unread thanks to column
        pruning). ``needs_rebuild`` trips when live rows moved >2× from
        build or the largest cell holds >4× the mean."""
        built = int(self.meta.get("built_rows", self.meta["rows"]))
        live = int(self.meta["rows"])
        sizes = [
            int(r["n"])
            for r in self._live_corpus(None)
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ]
        mean = (sum(sizes) / len(sizes)) if sizes else 0.0
        imbalance = (max(sizes) / mean) if mean else 0.0
        growth = (live / built) if built else float("inf")
        return {
            "built_rows": built,
            "live_rows": live,
            "growth": round(growth, 3),
            "cells_live": len(sizes),
            "max_cell_over_mean": round(imbalance, 3),
            "needs_rebuild": bool(
                growth > 2.0 or growth < 0.5 or imbalance > 4.0
            ),
        }

    def _data_dir(self):
        from datax_spark.operators.text_index import generation_dir

        return generation_dir(self.root, self.meta, "corpus")

    def compact(self) -> None:
        """Fold tombstones into the cell lists (rewrite live rows only,
        original seg values kept so stale tombstones can never kill a
        survivor) and clear the tombstone log — crash-safe via the
        shared ``text_index.publish_generation`` meta-commit sequence."""
        from datax_spark.operators.text_index import publish_generation

        live = self._live_corpus(None)
        publish_generation(
            self.root, self.meta, "corpus",
            lambda dest: live.write.mode("overwrite")
            .partitionBy("cell", "seg").parquet(str(dest)),
        )

    # ---------------- read side ---------------- #
    def centroids(self) -> DataFrame:
        return self.spark.read.parquet(str(self.root / "centroids"))

    def pq_codebook(self) -> DataFrame:
        if not self.meta.get("pq"):
            raise ValueError(f"index at {self.root} was built without PQ")
        return self.spark.read.parquet(str(self.root / "pq_codebook"))

    def corpus(self, cells: list[int] | None = None) -> DataFrame:
        reader = self.spark.read
        sj = self.meta.get("corpus_schema")
        if sj:
            from pyspark.sql import types as T

            reader = reader.schema(T.StructType.fromJson(json.loads(sj)))
        df = reader.parquet(str(self._data_dir()))
        if cells is not None:
            # partition filter on the Hive layout: only cell=<c> dirs
            # are listed/scanned
            df = df.filter(F.col("cell").isin([int(c) for c in cells]))
        return df

    def _tombstones(self) -> DataFrame | None:
        """Aggregated kill map gated on next_seg (committed transactions
        only) — the Bm25Index._tombstones contract."""
        tdir = self.root / "tombstones"
        if not tdir.exists():
            return None
        return (
            self.spark.read.parquet(str(tdir))
            .filter(
                F.col("before_seg") < F.lit(int(self.meta.get("next_seg", 1)))
            )
            .groupBy(self.meta["id_col"])
            .agg(F.max("before_seg").alias("before_seg"))
        )

    def _live_corpus(self, cells: list[int] | None) -> DataFrame:
        """Corpus minus dead generations: committed segments only (the
        seg < next_seg predicate is ALSO a partition filter, so a
        crashed transaction's orphan segment dirs aren't even listed),
        then the tombstone join keeps a vector's rows only at or past
        its latest re-add."""
        df = self.corpus(cells).filter(
            F.col("seg") < F.lit(int(self.meta.get("next_seg", 1)))
        )
        tomb = self._tombstones()
        if tomb is not None:
            df = (
                df.join(tomb, self.meta["id_col"], "left")
                .filter(
                    F.col("before_seg").isNull()
                    | (F.col("seg") >= F.col("before_seg"))
                )
                .drop("before_seg")
            )
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
        c = self._live_corpus(cells=probed).select(
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
        coded = self._live_corpus(cells=probed).select(
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
        floats = self._live_corpus(cells=probed).select(
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
