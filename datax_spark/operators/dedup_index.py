"""Persisted, incremental MinHash-LSH near-dup index.

`dedup.minhash_lsh_pairs` is the one-shot form: it signatures the whole
corpus every run. At 100 TB the corpus is ingested in batches and the
already-signatured part must never be re-read — the standard production
shape is an INDEX of signature classes + band buckets that each new
batch probes and then appends to (cost per add: O(batch) signature work
+ an equi-join of the batch's buckets against the stored bucket table;
the stored TEXT is never touched again).

Equivalence contract (tested, and driver-oracled as
``dedup_minhash_incremental``): the union of `add()` outputs over any
batch split equals the one-shot `minhash_lsh_pairs` over the full
corpus, row for row — every pair is found exactly once, in the add()
that saw its later batch.

Storage layout (all parquet + one json, same publish discipline as the
icetable: data dirs land first, meta.json names committed batches via
atomic replace, so a crashed add() leaves an orphan dir that the next
load ignores):

    path/meta.json                      k, bands, threshold, hash_fn,
                                        id_col, committed batch lists,
                                        optional IceTable sync cursor
    path/sigs/batch=N/                  (_sig, mh0..mh{k-1}) distinct
    path/buckets/batch=N/               (bucket, _sig)
    path/members/batch=N/               (_sig, doc_id)
    path/tombstones/batch=N/            (doc_id, before_batch) — the
                                        doc's membership in data
                                        batches < before_batch is dead
                                        (generation-scoped, so re-adds
                                        stay live); written by remove()
                                        and sync() for deleted/updated
                                        docs, so probes stop pairing
                                        against dead generations

``sync(table)`` makes this the CDC consumer the other index artifacts
are (text_index/trigram_index/ann_index): one atomic meta commit per
changelog span covering tombstones + the fresh batch + the cursor,
returning exactly the new pairs the span introduces.
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datax_spark.operators.dedup import (
    band_bucket_exprs,
    lsh_pairs_from_signatures,
    signatures_with_class,
)

FORMAT_VERSION = 1


def _band_buckets(sig: DataFrame, k: int, bands: int) -> DataFrame:
    """(bucket, _sig) rows via the ONE shared bucket construction
    (dedup.band_bucket_exprs) — index probes, one-shot runs, and the
    streaming operator bucket byte-identically."""
    return sig.select(
        F.explode(F.array(*band_bucket_exprs(k, bands))).alias("bucket"),
        "_sig",
    )


class MinHashIndex:
    def __init__(self, spark: SparkSession, path: Path, meta: dict):
        self.spark = spark
        self.path = Path(path)
        self.meta = meta

    # ------------------------------------------------------------ lifecycle
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str | Path,
        k: int = 8,
        bands: int = 4,
        jaccard_threshold: float = 0.7,
        hash_fn: str = "md5",
        id_col: str = "doc_id",
        text_col: str = "text",
        source: dict | None = None,
    ) -> "MinHashIndex":
        if k % bands:
            raise ValueError(f"bands={bands} must divide k={k}")
        path = Path(path)
        if (path / "meta.json").exists():
            # same rule as IceTable.create: never silently reset an
            # existing index (a retried job would orphan all signatures)
            raise FileExistsError(f"MinHash index already exists at {path}")
        path.mkdir(parents=True, exist_ok=True)
        meta = {
            "format_version": FORMAT_VERSION,
            "k": k,
            "bands": bands,
            "jaccard_threshold": jaccard_threshold,
            "hash_fn": hash_fn,
            "id_col": id_col,
            "text_col": text_col,
            "batches": [],
        }
        if source:
            meta["source"] = source
        idx = cls(spark, path, meta)
        idx._write_meta()
        return idx

    @classmethod
    def create_from_table(
        cls, spark: SparkSession, table, path: str | Path, **kwargs
    ) -> tuple["MinHashIndex", DataFrame]:
        """Create with a version cursor against an IceTable and index
        its current state as batch 0 — the Bm25Index.build_from_table
        contract for the near-dup index. Returns (index, the corpus's
        initial within-pairs); later ``sync(table)`` calls consume only
        the changelog."""
        v = table.current_version()
        idx = cls.create(
            spark, path, source={"path": str(table.root), "version": v},
            **kwargs,
        )
        docs = table.read(v).select(
            idx.meta["id_col"], idx.meta["text_col"]
        )
        return idx, idx.add(docs)

    @classmethod
    def load(cls, spark: SparkSession, path: str | Path) -> "MinHashIndex":
        path = Path(path)
        meta = json.loads((path / "meta.json").read_text())
        if meta["format_version"] != FORMAT_VERSION:
            raise ValueError(
                f"index at {path} has format {meta['format_version']}, "
                f"this build reads {FORMAT_VERSION}"
            )
        return cls(spark, path, meta)

    def _write_meta(self) -> None:
        tmp = tempfile.NamedTemporaryFile(
            "w", dir=self.path, prefix=".meta-", suffix=".json", delete=False
        )
        with tmp as f:
            json.dump(self.meta, f, indent=1)
        os.replace(tmp.name, self.path / "meta.json")

    def _read_committed(
        self, kind: str, batches: list[int] | None = None, with_batch: bool = False
    ) -> DataFrame | None:
        from pyspark.errors.exceptions.captured import AnalysisException

        if batches is None:
            batches = self.meta["batches"]
        dirs = [str(self.path / kind / f"batch={n}") for n in batches]
        if not dirs:
            return None
        try:
            if with_batch:
                # basePath keeps the batch=N partition column visible —
                # tombstones are generation-scoped (kill batches <
                # before), so a re-added id's NEW membership stays live
                return self.spark.read.option(
                    "basePath", str(self.path / kind)
                ).parquet(*dirs)
            return self.spark.read.parquet(*dirs)
        except AnalysisException:
            # every committed batch is fileless (adds of empty frames:
            # a changelog span of pure deletes) — semantically nothing
            # is stored
            return None

    def _tombstone_map(self, staged: DataFrame | None = None) -> DataFrame | None:
        """Aggregated (doc_id, before_batch=max) over the COMMITTED
        tombstone batches plus optionally one staged (uncommitted)
        frame — sync probes with its own removals already in force."""
        frames = []
        committed = self._read_committed(
            "tombstones", self.meta.get("tombstone_batches", [])
        )
        if committed is not None:
            frames.append(committed)
        if staged is not None:
            frames.append(staged)
        if not frames:
            return None
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out.groupBy("doc_id").agg(
            F.max("before_batch").alias("before_batch")
        )

    # ------------------------------------------------------------ the op
    def add(self, docs: DataFrame) -> DataFrame:
        """Probe ``docs`` against the index, append their signatures, and
        return every near-dup pair involving at least one new doc:
        (id_a, id_b, est_jaccard) with id_a < id_b. Doc ids must be
        fresh (never live in the index — the CDC key contract); a
        previously REMOVED id may be re-added. Updates/deletes go
        through remove()/sync()."""
        pairs, n = self._stage_batch(docs, None)
        self.meta["batches"].append(n)
        self._write_meta()
        return pairs

    def remove(self, ids: DataFrame) -> int:
        """Tombstone documents: their stored signatures stop producing
        pairs in every later probe. Generation-scoped (kills membership
        in batches < the next batch number), so a later re-add of the
        same id is live. Returns the number of ids tombstoned."""
        tn = self._next_batch("tombstone_batches")
        before = self._next_batch("batches")
        tomb = ids.select(
            F.col(self.meta["id_col"]).alias("doc_id"),
            F.lit(before).alias("before_batch"),
        )
        n = tomb.count()
        if n:
            tomb.write.mode("overwrite").parquet(
                str(self.path / "tombstones" / f"batch={tn}")
            )
            self.meta.setdefault("tombstone_batches", []).append(tn)
            self._write_meta()
        return n

    def sync(self, table, to_version: int | None = None) -> DataFrame:
        """Advance the index to the table's state from the changelog
        since the stored cursor (the Bm25Index contract) and return the
        NEW near-dup pairs: every pair of the one-shot run over the
        live corpus that involves at least one doc changed in the span.
        One atomic meta commit covers the tombstone batch, the data
        batch, and the cursor — a crash anywhere before it leaves only
        overwritable orphan dirs, so the deterministic retry converges."""
        src = self.meta.get("source")
        if not src:
            raise ValueError("index has no source cursor — create it with "
                             "source= or set meta['source']")
        if str(table.root) != src["path"]:
            raise ValueError(
                f"index tracks {src['path']}, got table at {table.root}"
            )
        m = self.meta
        id_col, text_col = m["id_col"], m["text_col"]
        frm = int(src["version"])
        to = table.current_version() if to_version is None else int(to_version)
        if to < frm:
            raise ValueError(f"cursor at v{frm} is past requested v{to}")
        if to == frm:
            # empty no-op frame with id_a/id_b typed like the CORPUS id
            # column — a hardcoded long here breaks unionByName/append
            # downstream when the corpus uses string doc ids
            from pyspark.sql import types as T

            idt = {f.name: f.dataType for f in table.schema().fields}[id_col]
            return self.spark.createDataFrame(
                [],
                T.StructType([
                    T.StructField("id_a", idt),
                    T.StructField("id_b", idt),
                    T.StructField("est_jaccard", T.DoubleType()),
                ]),
            )
        ch = table.read_changes(frm, to, pre_images=True).select(
            "_op", id_col, text_col
        )
        removed = ch.filter(F.col("_op").isin("D", "UB"))
        added = ch.filter(F.col("_op").isin("I", "UA")).drop("_op")

        tn = self._next_batch("tombstone_batches")
        before = self._next_batch("batches")
        tomb = removed.select(
            F.col(id_col).alias("doc_id"), F.lit(before).alias("before_batch")
        )
        n_rm = tomb.count()
        if n_rm:
            tomb.write.mode("overwrite").parquet(
                str(self.path / "tombstones" / f"batch={tn}")
            )
        pairs, n = self._stage_batch(added, tomb if n_rm else None)
        if n_rm:
            m.setdefault("tombstone_batches", []).append(tn)
        m["batches"].append(n)
        m["source"] = {**src, "version": to}
        self._write_meta()
        return pairs

    def purge_ids(self, ids) -> dict:
        """Physical erasure of the ids' signatures/membership (the
        Bm25Index purge_ids contract): remove, then compact — dead
        signature classes and their bucket rows are rewritten away, so
        no MinHash fingerprint of the erased documents remains."""
        if not isinstance(ids, DataFrame):
            ids = self.spark.createDataFrame(
                [(i,) for i in ids], [self.meta["id_col"]]
            )
        n = self.remove(ids)
        self.compact()
        return {"purged": n}

    def compact(self) -> dict:
        """Fold the batch chain + tombstones into ONE batch: live
        members only, signature classes with no remaining live member
        dropped (their bucket rows too — dead classes would otherwise
        keep paying candidate-join work forever on a churning corpus).
        Batch renumbering is safe because tombstones are cleared in the
        same transaction: the new single batch holds only live rows, so
        nothing remains for a stale tombstone to mis-kill. meta commit
        (atomic rename) last."""
        import shutil

        k = self.meta["k"]
        members = self._read_committed("members", with_batch=True)
        if members is None:
            return {"batches": 0, "members": 0}
        tomb = self._tombstone_map(None)
        if tomb is not None:
            members = (
                members.join(tomb, "doc_id", "left")
                .filter(
                    F.col("before_batch").isNull()
                    | (F.col("batch") >= F.col("before_batch"))
                )
                .drop("before_batch")
            )
        members = members.drop("batch")
        sigs = self._read_committed("sigs").distinct()
        live_sigs = sigs.join(
            members.select("_sig").distinct(), "_sig", "left_semi"
        )
        live_buckets = _band_buckets(live_sigs, k, self.meta["bands"])
        # stage the folded batch under a number PAST every old batch,
        # then commit meta naming ONLY it — a crash mid-stage leaves
        # the old chain fully intact
        n = self._next_batch("batches")
        members = members.localCheckpoint(eager=True)
        live_sigs = live_sigs.localCheckpoint(eager=True)
        live_sigs.write.mode("overwrite").parquet(
            str(self.path / "sigs" / f"batch={n}")
        )
        live_buckets.write.mode("overwrite").parquet(
            str(self.path / "buckets" / f"batch={n}")
        )
        members.write.mode("overwrite").parquet(
            str(self.path / "members" / f"batch={n}")
        )
        old_batches = list(self.meta["batches"])
        old_tombs = list(self.meta.get("tombstone_batches", []))
        self.meta["batches"] = [n]
        self.meta["tombstone_batches"] = []
        self._write_meta()
        for b in old_batches:
            for kind in ("sigs", "buckets", "members"):
                shutil.rmtree(self.path / kind / f"batch={b}",
                              ignore_errors=True)
        for b in old_tombs:
            shutil.rmtree(self.path / "tombstones" / f"batch={b}",
                          ignore_errors=True)
        return {"batches": 1, "members": members.count()}

    def _next_batch(self, key: str) -> int:
        lst = self.meta.get(key, [])
        return (max(lst) + 1) if lst else 0

    def _stage_batch(
        self, docs: DataFrame, staged_tombstones: DataFrame | None
    ) -> tuple[DataFrame, int]:
        """Probe + write one batch's sigs/buckets/members dirs WITHOUT
        committing meta (the caller owns the single atomic commit).
        ``staged_tombstones`` lets sync probe with its own removals
        already dead — an updated doc must not pair against its own
        previous generation."""
        m = self.meta
        k, bands, thr = m["k"], m["bands"], m["jaccard_threshold"]
        id_col = m["id_col"]

        # ONE signature pass feeds both the within-batch pair search and
        # the index rows (the signature explode+agg is the dominant
        # per-batch cost at corpus scale)
        sig = signatures_with_class(
            docs, k, id_col, m["text_col"], hash_fn=m["hash_fn"]
        )
        within = lsh_pairs_from_signatures(sig, k, bands, thr, id_col)
        new_members = sig.select("_sig", F.col(id_col).alias("doc_id"))
        new_reps = sig.select("_sig", *[f"mh{i}" for i in range(k)]).distinct()
        new_buckets = _band_buckets(new_reps, k, bands)

        stored_reps = self._read_committed("sigs")
        if stored_reps is not None:
            stored_buckets = self._read_committed("buckets")
            stored_members = self._read_committed("members", with_batch=True)
            tomb = self._tombstone_map(staged_tombstones)
            if tomb is not None:
                # generation-scoped kill: a doc's membership in batches
                # before its tombstone is dead; a later re-add is live
                stored_members = (
                    stored_members.join(tomb, "doc_id", "left")
                    .filter(
                        F.col("before_batch").isNull()
                        | (F.col("batch") >= F.col("before_batch"))
                    )
                    .drop("before_batch")
                )
            stored_members = stored_members.drop("batch")
            # candidates: stored sig × new sig sharing any band bucket.
            # No _sig ordering constraint — the sides are different sets;
            # identical cross-batch signatures co-bucket in every band and
            # verify at est = 1.0, so no separate intra-class path needed.
            cand = (
                stored_buckets.withColumnRenamed("_sig", "_sa")
                .join(new_buckets.withColumnRenamed("_sig", "_sb"), "bucket")
                .select("_sa", "_sb")
                .distinct()
            )
            ra = stored_reps.distinct().select(
                F.col("_sig").alias("_sa"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(k)]
            )
            rb = new_reps.select(
                F.col("_sig").alias("_sb"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(k)]
            )
            matches = sum(
                F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
                for i in range(k)
            )
            class_pairs = (
                cand.join(ra, "_sa")
                .join(rb, "_sb")
                .withColumn("est_jaccard", F.round(matches / F.lit(k), 4))
                .filter(F.col("est_jaccard") >= thr)  # threshold BEFORE expansion
                .select("_sa", "_sb", "est_jaccard")
            )
            cross = (
                class_pairs.join(
                    stored_members.select(F.col("_sig").alias("_sa"), F.col("doc_id").alias("_ida")),
                    "_sa",
                )
                .join(new_members.select(F.col("_sig").alias("_sb"), F.col("doc_id").alias("_idb")), "_sb")
                # a re-added id whose OLD generation still matches its
                # bucket must not pair with itself
                .filter(F.col("_ida") != F.col("_idb"))
                .select(
                    F.least("_ida", "_idb").alias("id_a"),
                    F.greatest("_ida", "_idb").alias("id_b"),
                    "est_jaccard",
                )
            )
            pairs = within.unionByName(cross)
        else:
            pairs = within

        # materialize the result BEFORE appending: the pair plan reads the
        # stored parquet lazily, and the append below must not race it.
        pairs = pairs.localCheckpoint(eager=True)

        # overwrite: a previous add()/sync() that crashed after writing
        # data dirs but before committing meta leaves orphans under the
        # same batch number — replacing them (instead of erroring) is
        # what makes the documented crash-recovery story true
        n = self._next_batch("batches")
        new_reps.write.mode("overwrite").parquet(str(self.path / "sigs" / f"batch={n}"))
        new_buckets.write.mode("overwrite").parquet(
            str(self.path / "buckets" / f"batch={n}")
        )
        new_members.write.mode("overwrite").parquet(
            str(self.path / "members" / f"batch={n}")
        )
        return pairs, n
