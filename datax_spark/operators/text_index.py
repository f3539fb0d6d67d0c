"""Persisted inverted text index — the lexical-retrieval sibling of
operators/ann_index.py (SURVEY.md §8: training-data pipeline operators;
BM25 is the Robertson/Sparck-Jones public formula, shared verbatim with
operators/retrieval.bm25_topk).

Why an artifact and not just the one-shot query: ``bm25_topk`` re-reads
and re-tokenizes the CORPUS per query batch. At 100 TB that is the cost
profile of a full scan per search. This index pays the tokenize +
(doc, term) aggregation ONCE, lays postings out as parquet partitioned
by ``bucket = pmod(xxhash64(term), B)``, and serves probes by reading
ONLY the probed terms' bucket directories — a partition-pruned scan
whose cost tracks the query's term set, not the corpus (plan-asserted
in tests/test_text_index.py).

Layout at ``root/`` (format v2 — segmented, CDC-maintainable):

- ``postings/bucket=*/seg=*/``  (term, doc_id, tf, dl) rows — the whole
  posting list of a term lives in exactly one bucket, so per-term
  document frequency is computable from the pruned read alone. ``seg``
  is the add-generation: ``build`` writes seg=0, each maintenance
  transaction writes one fresh segment.
- ``tombstones/``  append-only (doc_id, before_seg) rows: the doc's
  postings in segments < before_seg are dead. An update tombstones the
  old generation and re-adds the doc in the new segment (Lucene's
  delete-and-readd, re-expressed as parquet + a join); a delete only
  tombstones.
- ``meta.json``  n_docs + sum_dl (the ONLY corpus-global stats BM25
  needs, kept exact under adds AND removals), next_seg, and — when the
  index tracks an IceTable — the source path + version cursor. Written
  LAST via atomic rename: meta is the commit point, so a crashed
  transaction is invisible (its orphan segment sits at seg >= next_seg,
  which probes filter out, and the retry rewrites that segment via
  dynamic partition overwrite).

Incremental growth: ``add(new_docs)`` appends the new documents'
postings — BM25 depends only on additive aggregates (tf, df, N, Σdl),
so probe(after adds) is result-identical to an index built from the
union in one shot (differential-tested). Updates/deletes go through
``apply_changes`` (tombstone + re-add), and ``sync(table)`` drives that
straight from an IceTable changelog (``read_changes`` with pre-images):
maintenance cost scales with the CHANGED documents, not the corpus —
the index is a CDC consumer, same contract as the incremental
materialized views. probe(synced index) == probe(one-shot rebuild at
the same table version), differential-tested across arbitrary I/U/D
histories. ``compact()`` rewrites only the live rows (original seg
values kept, so stale tombstones can never kill a survivor) and clears
the tombstone log.

Determinism: scores round to 4 decimals with ascending-doc-id
tie-break, identical to bm25_topk, so the two paths and the DuckDB
oracle agree row for row.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datax_spark.operators.retrieval import _tokens

FORMAT = "bm25-postings-v2"


def generation_dir(root: Path, meta: dict, prefix: str) -> Path:
    """Committed data dir of a generation-published artifact — named by
    meta after a compaction; ``prefix`` is the build-time default."""
    return Path(root) / meta.get("data_dir", prefix)


def publish_generation(
    root: Path, meta: dict, prefix: str, write, clear_tombstones: bool = True
) -> None:
    """Stage-and-publish a folded data generation via the meta commit
    point — the ONE implementation of the crash-safe compact sequence
    shared by Bm25Index / TrigramIndex / IvfIndex (it was previously
    copy-pasted per index, where a fix to the commit window would have
    to land three times): ``write(dest)`` stages the folded rows under
    a generation-named dir, the atomic meta rename publishes it (a
    crash before that leaves the old generation fully readable and the
    retry overwrites the orphan), then the tombstone log and every
    unreferenced generation are GC'd. Leftover tombstones from a crash
    between commit and GC are harmless: folded rows keep their original
    seg values, and survivors satisfy seg >= before_seg by definition."""
    root = Path(root)
    gen = int(meta.get("data_gen", 0)) + 1
    new_dir = f"{prefix}-g{gen}"
    write(root / new_dir)
    meta["data_dir"] = new_dir
    meta["data_gen"] = gen
    _write_meta(root, meta)
    if clear_tombstones:
        shutil.rmtree(root / "tombstones", ignore_errors=True)
    for p in root.iterdir():
        if p.name == new_dir or not p.is_dir():
            continue
        if p.name == prefix or p.name.startswith(f"{prefix}-g") or (
            p.name.startswith(f".{prefix}-")
        ):
            shutil.rmtree(p, ignore_errors=True)


def _postings(docs: DataFrame, id_col: str, text_col: str, n_buckets: int):
    """(term, doc_id, tf, dl, bucket) rows plus the (n_docs, sum_dl)
    stats row — one tokenize pass. A null/empty text contributes 0 to
    sum_dl and no posting rows, but still counts in n_docs (it is a
    document; it just matches nothing)."""
    base = docs.select(F.col(id_col), _tokens(F.col(text_col)).alias("_toks"))
    dl = F.greatest(F.coalesce(F.size("_toks"), F.lit(0)), F.lit(0))
    rows = (
        base.select(id_col, dl.alias("dl"), F.explode("_toks").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum(dl).alias("sum_dl")
    )
    return rows, stats


def _doc_stats(docs: DataFrame, id_col: str, text_col: str):
    """(n_docs, sum_dl) of a document set — what removal must subtract.
    Tokenizes with the SAME _tokens as indexing, so the subtracted dl
    is exactly the dl that was added when the doc was indexed."""
    toks = _tokens(F.col(text_col))
    dl = F.greatest(F.coalesce(F.size(toks), F.lit(0)), F.lit(0))
    return docs.select(F.col(id_col), dl.alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )


class Bm25Index:
    def __init__(self, spark: SparkSession, root: str | Path):
        self.spark = spark
        self.root = Path(root)
        meta_path = self.root / "meta.json"
        if not meta_path.exists():
            raise FileNotFoundError(f"no BM25 index at {self.root}")
        self.meta = json.loads(meta_path.read_text())
        if self.meta.get("format") != FORMAT:
            raise ValueError(
                f"unknown index format {self.meta.get('format')!r} — "
                f"pre-v2 (unsegmented) indexes must be rebuilt"
            )

    # ---------------- build ---------------- #
    @staticmethod
    def build(
        docs: DataFrame,
        root: str | Path,
        n_buckets: int = 64,
        id_col: str = "doc_id",
        text_col: str = "text",
        source: dict | None = None,
        where: str | None = None,
    ) -> "Bm25Index":
        """``where`` scopes the index to a SQL predicate over the doc
        rows, FROZEN in meta: sync() keeps applying it, so an update
        that moves a doc across the predicate boundary becomes an
        index insert or delete (the pre-image is tombstoned either
        way — tombstoning a never-indexed id is harmless)."""
        root = Path(root)
        spark = docs.sparkSession
        if where:
            docs = docs.filter(F.expr(where))
        rows, stats = _postings(docs, id_col, text_col, n_buckets)
        rows = rows.withColumn("seg", F.lit(0))
        rows.write.mode("overwrite").partitionBy("bucket", "seg").parquet(
            str(root / "postings")
        )
        s = stats.collect()[0]
        meta = {
            # the read-side schema: an index built over (or compacted
            # down to) an EMPTY corpus has fileless postings dirs, which
            # schema inference cannot read
            "postings_schema": rows.schema.json(),
            "format": FORMAT,
            "n_buckets": n_buckets,
            "id_col": id_col,
            "text_col": text_col,
            "n_docs": int(s["n_docs"]),
            "sum_dl": int(s["sum_dl"] or 0),
            "next_seg": 1,
        }
        if where:
            meta["where"] = where
        if source:
            meta["source"] = source
        _write_meta(root, meta)
        return Bm25Index(spark, root)

    @staticmethod
    def build_from_table(
        table,
        root: str | Path,
        n_buckets: int = 64,
        id_col: str = "doc_id",
        text_col: str = "text",
        where: str | None = None,
    ) -> "Bm25Index":
        """Build from an IceTable's CURRENT state and remember the
        (path, version) cursor so ``sync`` can maintain the index from
        the table's changelog instead of rebuilding. ``where`` may
        reference ANY table column (e.g. ``lang = 'en'``) — the
        predicate travels in meta and sync keeps applying it to the
        changelog post-images."""
        v = table.current_version()
        return Bm25Index.build(
            table.read(v),  # full rows: the predicate sees every column
            root,
            n_buckets=n_buckets,
            id_col=id_col,
            text_col=text_col,
            source={"path": str(table.root), "version": v},
            where=where,
        )

    def _commit_meta(self) -> None:
        _write_meta(self.root, self.meta)

    def _data_dir(self) -> Path:
        return generation_dir(self.root, self.meta, "postings")

    def add(self, new_docs: DataFrame) -> int:
        """Append NEW documents' postings (ids must not already be
        indexed — BM25's aggregates are additive, so union-of-adds is
        one-shot-equal, but a re-added id would double-count its tf).
        Returns the number of documents added. Updates/deletes go
        through apply_changes/sync."""
        return self.apply_changes(None, new_docs)["added"]

    def apply_changes(
        self,
        removed_docs: DataFrame | None,
        added_docs: DataFrame | None,
        meta_extra: dict | None = None,
    ) -> dict:
        """One maintenance transaction: tombstone ``removed_docs``
        (which must carry their PRE-change text — the changelog's
        pre-image — so the global stats can be decremented exactly
        without reading the index back) and index ``added_docs`` under
        one fresh segment. An updated doc appears on both sides.

        Crash-safe around the meta.json commit point: the new segment
        is written with dynamic partition overwrite (a retry replaces
        the orphan, never duplicates it), tombstones are append-only
        and idempotent under max-aggregation, and stats/next_seg/cursor
        move only in the final atomic meta write. ``meta_extra`` rides
        in that SAME commit (sync's cursor — a separate write would let
        a crash between the two replay the span and double-apply the
        stats)."""
        id_col, text_col = self.meta["id_col"], self.meta["text_col"]
        seg = int(self.meta.get("next_seg", 1))
        n_rm = dl_rm = 0
        if removed_docs is not None:
            s = _doc_stats(removed_docs, id_col, text_col).collect()[0]
            n_rm, dl_rm = int(s["n_docs"]), int(s["sum_dl"] or 0)
            if n_rm:
                removed_docs.select(
                    F.col(id_col), F.lit(seg).alias("before_seg")
                ).write.mode("append").parquet(str(self.root / "tombstones"))
        n_add = dl_add = 0
        if added_docs is not None:
            rows, stats = _postings(
                added_docs, id_col, text_col, self.meta["n_buckets"]
            )
            (
                rows.withColumn("seg", F.lit(seg))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket", "seg")
                .parquet(str(self._data_dir()))
            )
            s = stats.collect()[0]
            n_add, dl_add = int(s["n_docs"]), int(s["sum_dl"] or 0)
        self.meta["n_docs"] = int(self.meta["n_docs"]) - n_rm + n_add
        self.meta["sum_dl"] = int(self.meta["sum_dl"]) - dl_rm + dl_add
        self.meta["next_seg"] = seg + 1
        if meta_extra:
            self.meta.update(meta_extra)
        self._commit_meta()
        return {"removed": n_rm, "added": n_add, "seg": seg}

    def sync(self, table, to_version: int | None = None) -> dict:
        """Advance the index to the table's state at ``to_version`` by
        consuming the CHANGELOG since the stored cursor — cost scales
        with the changed documents, not the corpus. After sync, probe()
        is row-identical to an index rebuilt from
        ``table.read(to_version)`` in one shot (differential-tested in
        tests/test_text_index.py, including delete-then-reinsert and
        repeated updates of one key)."""
        src = self.meta.get("source")
        if not src:
            raise ValueError(
                "index was not built with build_from_table — no cursor"
            )
        if str(table.root) != src["path"]:
            raise ValueError(
                f"index tracks {src['path']}, got table at {table.root}"
            )
        id_col, text_col = self.meta["id_col"], self.meta["text_col"]
        frm = int(src["version"])
        to = table.current_version() if to_version is None else int(to_version)
        if to < frm:
            raise ValueError(f"cursor at v{frm} is past requested v{to}")
        if to == frm:
            return {"removed": 0, "added": 0, "from": frm, "to": to}
        ch = table.read_changes(frm, to, pre_images=True)
        removed = ch.filter(F.col("_op").isin("D", "UB")).select(
            id_col, text_col
        )
        added = ch.filter(F.col("_op").isin("I", "UA"))
        where = self.meta.get("where")
        if where:
            # predicate-scoped index: only matching post-images enter;
            # pre-images are tombstoned unconditionally, so an update
            # crossing the predicate boundary becomes an index
            # insert/delete. The removal-side stats subtraction must
            # mirror what was INDEXED, so it applies the predicate to
            # the pre-image rows.
            added = added.filter(F.expr(where))
            removed = ch.filter(F.col("_op").isin("D", "UB")).filter(
                F.expr(where)
            ).select(id_col, text_col)
        added = added.select(id_col, text_col)
        out = self.apply_changes(
            removed, added, meta_extra={"source": {**src, "version": to}}
        )
        return {**out, "from": frm, "to": to}

    def purge_ids(self, ids) -> dict:
        """Right-to-be-forgotten for the INDEX artifact: the table's
        purge_keys erases rows from every retained snapshot, but this
        index still holds the erased docs' tokens — and the purged
        history means no changelog pre-image exists to sync from. So
        the removal stats come from the index's OWN postings (dl is
        stored per row), the ids are tombstoned, and compact() runs
        immediately: erasure must be physical, not a masking join.
        Caveat: a zero-token doc has no postings to find, so its
        n_docs contribution survives (there is no content to erase);
        exactness restores at the next rebuild. ``ids`` is a list or a
        single-column DataFrame named like id_col."""
        id_col = self.meta["id_col"]
        if not isinstance(ids, DataFrame):
            ids = self.spark.createDataFrame(
                [(i,) for i in ids], self._tombstone_id_schema()
            )
        ids = ids.select(id_col)
        per_doc = (
            self._live_postings(None)
            .join(F.broadcast(ids), id_col, "left_semi")
            .groupBy(id_col)
            .agg(F.max("dl").alias("dl"))
        )
        s = per_doc.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dl").alias("dl")
        ).collect()[0]
        n_rm, dl_rm = int(s["n"]), int(s["dl"] or 0)
        seg = int(self.meta.get("next_seg", 1))
        if n_rm:
            ids.select(
                F.col(id_col), F.lit(seg).alias("before_seg")
            ).write.mode("append").parquet(str(self.root / "tombstones"))
        self.meta["n_docs"] = int(self.meta["n_docs"]) - n_rm
        self.meta["sum_dl"] = int(self.meta["sum_dl"]) - dl_rm
        self.meta["next_seg"] = seg + 1
        self._commit_meta()
        self.compact()
        return {"purged": n_rm}

    def _tombstone_id_schema(self):
        from pyspark.sql import types as T

        fields = T.StructType.fromJson(
            json.loads(self.meta["postings_schema"])
        )
        idt = {f.name: f.dataType for f in fields}[self.meta["id_col"]]
        return T.StructType([T.StructField(self.meta["id_col"], idt)])

    def compact(self) -> dict:
        """Fold tombstones into the postings: rewrite ONLY the live
        rows (original seg values kept — a stale tombstone can never
        kill a survivor, since survivors satisfy seg >= before_seg by
        definition) and clear the tombstone log. Bounds the probe-side
        anti-work at churn-proportional intervals.

        Crash-safe via the shared ``publish_generation`` meta-commit
        sequence (the earlier two-rename swap had a window with NO
        postings dir at all, leaving the index unreadable with its data
        hidden under a .postings-old-* temp name)."""
        live = self._live_postings(None)
        cols = ["term", self.meta["id_col"], "tf", "dl", "bucket", "seg"]
        publish_generation(
            self.root, self.meta, "postings",
            lambda dest: live.select(*cols).write.mode("overwrite")
            .partitionBy("bucket", "seg").parquet(str(dest)),
        )
        return {"n_docs": self.meta["n_docs"]}

    # ---------------- read side ---------------- #
    def postings(self, buckets: list[int] | None = None) -> DataFrame:
        reader = self.spark.read
        sj = self.meta.get("postings_schema")
        if sj:  # explicit schema: empty dirs readable, no inference pass
            from pyspark.sql import types as T

            reader = reader.schema(T.StructType.fromJson(json.loads(sj)))
        df = reader.parquet(str(self._data_dir()))
        if buckets is not None:
            df = df.filter(F.col("bucket").isin([int(b) for b in buckets]))
        return df

    def _tombstones(self) -> DataFrame | None:
        """Aggregated kill map: (id_col, before_seg=max) — idempotent
        under replayed appends. Gated on next_seg exactly like the
        postings: a committed transaction's tombstones carry
        before_seg < next_seg, so a crashed (unpublished) transaction's
        tombstones are invisible until its retry commits — and the
        retry must replay the SAME change span, the system-wide
        deterministic-replay contract the table's epoch ledger already
        imposes."""
        tdir = self.root / "tombstones"
        if not tdir.exists():
            return None
        id_col = self.meta["id_col"]
        return (
            self.spark.read.parquet(str(tdir))
            .filter(F.col("before_seg") < F.lit(int(self.meta.get("next_seg", 1))))
            .groupBy(id_col)
            .agg(F.max("before_seg").alias("before_seg"))
        )

    def _live_postings(self, buckets: list[int] | None) -> DataFrame:
        """Postings minus dead generations: committed segments only
        (seg < next_seg filters a crashed transaction's orphan segment
        — it's also a partition filter, so orphan dirs aren't even
        read), then the tombstone join keeps a doc's rows only at or
        past its latest re-add."""
        df = self.postings(buckets).filter(
            F.col("seg") < F.lit(int(self.meta.get("next_seg", 1)))
        )
        tomb = self._tombstones()
        if tomb is not None:
            id_col = self.meta["id_col"]
            df = (
                df.join(tomb, id_col, "left")
                .filter(
                    F.col("before_seg").isNull()
                    | (F.col("seg") >= F.col("before_seg"))
                )
                .drop("before_seg")
            )
        return df

    def probe(
        self,
        queries: DataFrame,
        k: int = 5,
        k1: float = 1.2,
        b: float = 0.75,
        query_id_col: str = "query_id",
        query_col: str = "query",
    ) -> DataFrame:
        """Top-k BM25 per query, reading only the probed buckets.

        Identical formula, rounding, and tie-break to bm25_topk — the
        one-shot path is the oracle for this artifact."""
        id_col = self.meta["id_col"]
        n_buckets = int(self.meta["n_buckets"])
        if int(self.meta["n_docs"]) <= 0:
            # empty index (built over / synced down to zero docs):
            # nothing can match, and avgdl is undefined
            return (
                queries.limit(0)
                .select(query_id_col)
                .crossJoin(self.postings([]).select(F.col(id_col)).limit(0))
                .withColumn("score", F.lit(0.0))
                .withColumn("rank", F.lit(0).cast("bigint"))
                .select(query_id_col, id_col, "score", "rank")
            )
        qterms = (
            queries.select(
                query_id_col, F.explode(_tokens(F.col(query_col))).alias("term")
            )
            .distinct()
        )
        # the query term set is tiny: one driver-side pass fixes the
        # bucket list so the postings scan partition-prunes
        term_rows = (
            qterms.select("term")
            .distinct()
            .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))
            .collect()
        )
        buckets = sorted({r["bucket"] for r in term_rows})
        needed = self.spark.createDataFrame(
            [(r["term"],) for r in term_rows] or [(None,)], "term string"
        ).filter(F.col("term").isNotNull())
        tf = self._live_postings(buckets).join(
            F.broadcast(needed), "term"
        ).select("term", F.col(id_col), "tf", "dl")
        n = float(self.meta["n_docs"])
        avgdl = self.meta["sum_dl"] / self.meta["n_docs"]
        df_t = tf.groupBy("term").agg(
            F.count(F.lit(1)).cast("double").alias("df")
        )
        idf = df_t.select(
            "term",
            F.log(
                F.lit(1.0) + (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ).alias("idf"),
        )
        per_term = (
            tf.join(F.broadcast(idf), "term")
            .join(F.broadcast(qterms), "term")
            .select(
                query_id_col,
                id_col,
                (
                    F.col("idf")
                    * (F.col("tf") * (k1 + 1.0))
                    / (
                        F.col("tf")
                        + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
                    )
                ).alias("_s"),
            )
        )
        w = Window.partitionBy(query_id_col).orderBy(
            F.col("score").desc(), F.col(id_col).asc()
        )
        return (
            per_term.groupBy(query_id_col, id_col)
            .agg(F.round(F.sum("_s"), 4).alias("score"))
            .withColumn("rank", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rank") <= k)
            .select(query_id_col, id_col, "score", "rank")
        )


def _write_meta(root: Path, meta: dict) -> None:
    """Atomic publish: temp file + rename, the same pattern as the
    MinHash index artifact — readers see the old or new meta, never a
    torn one."""
    root.mkdir(parents=True, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=root, prefix=".meta-", suffix=".json")
    with os.fdopen(fd, "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(tmp, root / "meta.json")
