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
                                        id_col, committed batch list
    path/sigs/batch=N/                  (_sig, mh0..mh{k-1}) distinct
    path/buckets/batch=N/               (bucket, _sig)
    path/members/batch=N/               (_sig, doc_id)
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
        idx = cls(spark, path, meta)
        idx._write_meta()
        return idx

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

    def _read_committed(self, kind: str) -> DataFrame | None:
        dirs = [
            str(self.path / kind / f"batch={n}") for n in self.meta["batches"]
        ]
        if not dirs:
            return None
        return self.spark.read.parquet(*dirs)

    # ------------------------------------------------------------ the op
    def add(self, docs: DataFrame) -> DataFrame:
        """Probe ``docs`` against the index, append their signatures, and
        return every near-dup pair involving at least one new doc:
        (id_a, id_b, est_jaccard) with id_a < id_b. Doc ids must be
        globally unique across adds (the CDC key contract)."""
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
            stored_members = self._read_committed("members")
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

        # overwrite: a previous add() that crashed after writing data
        # dirs but before committing meta leaves orphans under the same
        # batch number — replacing them (instead of erroring) is what
        # makes the documented crash-recovery story true
        n = (max(m["batches"]) + 1) if m["batches"] else 0
        new_reps.write.mode("overwrite").parquet(str(self.path / "sigs" / f"batch={n}"))
        new_buckets.write.mode("overwrite").parquet(
            str(self.path / "buckets" / f"batch={n}")
        )
        new_members.write.mode("overwrite").parquet(
            str(self.path / "members" / f"batch={n}")
        )
        m["batches"].append(n)
        self._write_meta()
        return pairs
