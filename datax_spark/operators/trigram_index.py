"""Trigram substring index — accelerated ``LIKE '%...%'`` (pg_trgm /
Google Code Search style).

BM25 (operators/text_index) answers ranked KEYWORD queries; blooms
answer key membership; neither helps an arbitrary SUBSTRING predicate,
which at 100 TB is otherwise a full corpus scan per query. The trigram
index makes it: every document posts its distinct character 3-grams
once; a query needs ALL the pattern's 3-grams present, so candidates =
the AND-intersection of |pattern|-2 posting lists, then the exact
``contains`` verify touches candidates only. False positives possible
(grams present, order wrong) — the verify is mandatory; false
negatives impossible for patterns ≥ 3 chars (every substring occurrence
posts all its grams).

Scale shape: the index is ONE explode + distinct shuffle over the
corpus, O(total chars) postings partitioned by gram (hot grams spread
over files; a query reads only its grams' postings). A query is a
broadcast of ≤ |pattern| grams against the postings, one count-per-doc
aggregate bounded by the rarest gram's posting list, and a semi-join
back to the corpus for the verify — the corpus is never scanned.
Patterns shorter than 3 characters have no gram to prune on and fall
back to the scan, loudly (parameter, not surprise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm(col):
    return F.lower(col)


def trigram_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(gram, doc_id) — distinct lowercased character 3-grams per doc."""
    t = _norm(F.col(text_col))
    # guard: sequence(1, len-2) DESCENDS when len < 3 — short texts
    # must yield an empty gram array, not [1, 0]-indexed garbage
    idx = F.when(
        F.length(t) >= 3, F.sequence(F.lit(1), F.length(t) - 2)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: t.substr(i, F.lit(3)))
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("gram"))
        .distinct()
    )


def pattern_grams(pattern: str) -> list[str]:
    p = pattern.lower()
    return sorted({p[i : i + 3] for i in range(len(p) - 2)})


class TrigramIndex:
    """Persisted trigram index — same artifact pattern as Bm25Index
    (operators/text_index.py v2): postings laid out as parquet
    partitioned by ``(bucket = pmod(xxhash64(gram), B), seg)``, so a
    query reads ONLY its pattern's grams' buckets (partition-pruned
    scan, cost tracks the pattern, not the corpus), and the index is a
    CDC CONSUMER — ``sync(table)`` tombstones changed/deleted docs'
    postings and writes the changed docs into one fresh segment, so
    maintenance cost scales with churn, not corpus. Candidate sets
    after sync equal a one-shot rebuild (differential-tested); even
    stale postings could never produce a wrong RESULT (the mandatory
    contains-verify runs against the live corpus), tombstones keep the
    PRUNING sharp and the artifact bounded on a churning corpus.

    Crash safety mirrors Bm25Index: meta.json (atomic rename) is the
    commit point; an unpublished transaction's segment and tombstones
    sit at >= next_seg and are invisible; the retry dynamic-overwrites
    its own segment and re-appends tombstones idempotently."""

    FORMAT = "trigram-postings-v2"

    def __init__(self, spark, root):
        import json
        from pathlib import Path

        self.spark = spark
        self.root = Path(root)
        meta_path = self.root / "meta.json"
        if not meta_path.exists():
            raise FileNotFoundError(f"no trigram index at {self.root}")
        self.meta = json.loads(meta_path.read_text())
        if self.meta.get("format") != self.FORMAT:
            raise ValueError(
                f"unknown index format {self.meta.get('format')!r} — "
                f"pre-v2 (unsegmented) indexes must be rebuilt"
            )

    @staticmethod
    def build(
        docs: DataFrame,
        root,
        n_buckets: int = 64,
        id_col: str = "doc_id",
        text_col: str = "text",
        source: dict | None = None,
        where: str | None = None,
    ) -> "TrigramIndex":
        from pathlib import Path

        from datax_spark.operators.text_index import _write_meta

        root = Path(root)
        if where:
            docs = docs.filter(F.expr(where))
        rows = trigram_postings(docs, id_col, text_col).withColumn(
            "bucket", F.pmod(F.xxhash64("gram"), F.lit(n_buckets))
        ).withColumn("seg", F.lit(0))
        rows.write.mode("overwrite").partitionBy("bucket", "seg").parquet(
            str(root / "postings")
        )
        meta = {
            # empty-corpus dirs are fileless; inference cannot read them
            "postings_schema": rows.schema.json(),
            "format": TrigramIndex.FORMAT,
            "n_buckets": n_buckets,
            "id_col": id_col,
            "text_col": text_col,
            "next_seg": 1,
        }
        if source:
            meta["source"] = source
        if where:
            meta["where"] = where
        _write_meta(root, meta)
        return TrigramIndex(docs.sparkSession, root)

    @staticmethod
    def build_from_table(
        table, root, n_buckets: int = 64, id_col: str = "doc_id",
        text_col: str = "text", where: str | None = None,
    ) -> "TrigramIndex":
        """Build from an IceTable's current state with a version cursor
        for ``sync`` — the Bm25Index.build_from_table contract,
        including the frozen ``where`` predicate scope."""
        v = table.current_version()
        return TrigramIndex.build(
            table.read(v),  # full rows: the predicate sees every column
            root,
            n_buckets=n_buckets,
            id_col=id_col,
            text_col=text_col,
            source={"path": str(table.root), "version": v},
            where=where,
        )

    def add(self, new_docs: DataFrame) -> None:
        """Append postings for NEW document ids (a re-added id would
        duplicate its postings and blunt the AND-intersection pruning —
        ids must be fresh, like Bm25Index.add). Updates/deletes go
        through apply_changes/sync."""
        self.apply_changes(None, new_docs)

    def apply_changes(
        self,
        removed_ids: DataFrame | None,
        added_docs: DataFrame | None,
        meta_extra: dict | None = None,
    ) -> dict:
        """One maintenance transaction: tombstone ``removed_ids``
        (id column only — trigram postings carry no corpus-global
        stats, so removal needs no pre-image text) and post
        ``added_docs`` under one fresh segment. An updated doc appears
        on both sides."""
        from datax_spark.operators.text_index import _write_meta

        id_col = self.meta["id_col"]
        seg = int(self.meta.get("next_seg", 1))
        n_rm = 0
        if removed_ids is not None:
            # postings alias the id to "doc_id" (trigram_postings);
            # tombstones match that, whatever the corpus id column is
            tomb = removed_ids.select(
                F.col(id_col).alias("doc_id"), F.lit(seg).alias("before_seg")
            )
            n_rm = tomb.count()
            if n_rm:
                tomb.write.mode("append").parquet(str(self.root / "tombstones"))
        n_add = 0
        if added_docs is not None:
            rows = trigram_postings(
                added_docs, id_col, self.meta["text_col"]
            ).withColumn(
                "bucket",
                F.pmod(F.xxhash64("gram"), F.lit(self.meta["n_buckets"])),
            )
            (
                rows.withColumn("seg", F.lit(seg))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket", "seg")
                .parquet(str(self._data_dir()))
            )
            n_add = added_docs.count()
        self.meta["next_seg"] = seg + 1
        if meta_extra:
            self.meta.update(meta_extra)
        _write_meta(self.root, self.meta)
        return {"removed": n_rm, "added": n_add, "seg": seg}

    def sync(self, table, to_version: int | None = None) -> dict:
        """Advance the index to the table state at ``to_version`` from
        the changelog since the stored cursor — cost scales with the
        changed documents. search(synced) ≡ search(one-shot rebuild)."""
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
        removed = ch.filter(F.col("_op").isin("D", "UB"))
        added = ch.filter(F.col("_op").isin("I", "UA"))
        where = self.meta.get("where")
        if where:
            # predicate-scoped: only matching post-images enter; only
            # pre-images that matched (= were indexed) tombstone
            removed = removed.filter(F.expr(where))
            added = added.filter(F.expr(where))
        out = self.apply_changes(
            removed.select(id_col),
            added.select(id_col, text_col),
            meta_extra={"source": {**src, "version": to}},
        )
        return {**out, "from": frm, "to": to}

    def purge_ids(self, ids) -> dict:
        """Physical erasure of the ids' gram postings (the Bm25Index
        purge_ids contract — no stats to adjust here): tombstone, then
        compact immediately."""
        import json as _json

        from pyspark.sql import types as T

        id_col = self.meta["id_col"]
        if not isinstance(ids, DataFrame):
            fields = T.StructType.fromJson(
                _json.loads(self.meta["postings_schema"])
            )
            idt = {f.name: f.dataType for f in fields}["doc_id"]
            ids = self.spark.createDataFrame(
                [(i,) for i in ids],
                T.StructType([T.StructField(id_col, idt)]),
            )
        # report ids actually LIVE in the index (the Bm25Index/IvfIndex
        # purge contract) — counting the request over-reports erasure
        # for absent or already-purged ids in the compliance trail
        live_ids = self._live_postings(None).select("doc_id").distinct()
        n_live = (
            ids.select(F.col(id_col).alias("doc_id"))
            .distinct()
            .join(live_ids, "doc_id", "left_semi")
            .count()
        )
        self.apply_changes(ids.select(id_col), None)
        self.compact()
        return {"purged": n_live}

    def _data_dir(self):
        from datax_spark.operators.text_index import generation_dir

        return generation_dir(self.root, self.meta, "postings")

    def compact(self) -> None:
        """Fold tombstones into the postings (rewrite live rows only,
        original seg values kept) and clear the tombstone log —
        crash-safe via the shared ``text_index.publish_generation``
        meta-commit sequence."""
        from datax_spark.operators.text_index import publish_generation

        live = self._live_postings(None)
        publish_generation(
            self.root, self.meta, "postings",
            lambda dest: live.select("gram", "doc_id", "bucket", "seg")
            .write.mode("overwrite").partitionBy("bucket", "seg")
            .parquet(str(dest)),
        )

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
            .groupBy("doc_id")
            .agg(F.max("before_seg").alias("before_seg"))
        )

    def _live_postings(self, buckets: list[int] | None) -> DataFrame:
        import json

        reader = self.spark.read
        sj = self.meta.get("postings_schema")
        if sj:
            from pyspark.sql import types as T

            reader = reader.schema(T.StructType.fromJson(json.loads(sj)))
        df = reader.parquet(str(self._data_dir())).filter(
            F.col("seg") < F.lit(int(self.meta.get("next_seg", 1)))
        )
        if buckets is not None:
            df = df.filter(F.col("bucket").isin(buckets))
        tomb = self._tombstones()
        if tomb is not None:
            df = (
                df.join(tomb, "doc_id", "left")
                .filter(
                    F.col("before_seg").isNull()
                    | (F.col("seg") >= F.col("before_seg"))
                )
                .drop("before_seg")
            )
        return df

    def search(self, docs: DataFrame, pattern: str) -> DataFrame:
        """doc_ids of ``docs`` matching ``pattern``, candidates from the
        PERSISTED postings (only the pattern grams' buckets are read),
        verify against ``docs`` text. Falls back to the honest scan for
        patterns < 3 chars."""
        grams = pattern_grams(pattern)
        id_col, text_col = self.meta["id_col"], self.meta["text_col"]
        if not grams:
            return like_search(docs, pattern, id_col=id_col, text_col=text_col)
        n_buckets = int(self.meta["n_buckets"])
        spark = self.spark
        g = spark.createDataFrame([(x,) for x in grams], "gram string")
        buckets = sorted(
            {
                r["bucket"]
                for r in g.withColumn(
                    "bucket", F.pmod(F.xxhash64("gram"), F.lit(n_buckets))
                ).collect()
            }
        )
        post = self._live_postings(buckets)
        cands = (
            post.join(F.broadcast(g), "gram")
            .select("doc_id", "gram")
            .distinct()  # append-mode adds may duplicate (gram, doc) pairs
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") == len(grams))
            .select("doc_id")
        )
        contains = F.contains(_norm(F.col(text_col)), F.lit(pattern.lower()))
        return (
            docs.join(cands, docs[id_col] == cands["doc_id"], "left_semi")
            .filter(contains)
            .select(F.col(id_col).alias("doc_id"))
        )


def multi_like_search(
    docs: DataFrame,
    patterns: dict[int, str],
    postings: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(pattern_id, doc_id) for EVERY pattern a doc contains — N LIKE
    predicates served in ONE pruned pass (the content-filter /
    moderation shape: match a phrase list against the corpus without N
    scans). All patterns' grams read together; the AND-intersection
    runs per (pattern, doc) via one groupBy; the mandatory
    contains-verify is a single codegen pass with one CASE per pattern
    (patterns are a driver-side list — hundreds, not millions).
    Patterns shorter than 3 chars take the scan path for just those
    patterns, loudly in the plan, silently in the result."""
    spark = docs.sparkSession
    gram_rows = []
    short_ids = []
    for pid, pat in sorted(patterns.items()):
        grams = pattern_grams(pat)
        if not grams:
            short_ids.append(pid)
            continue
        for g in grams:
            gram_rows.append((int(pid), g, len(grams)))
    out = []
    if gram_rows:
        need = spark.createDataFrame(
            gram_rows, "pattern_id long, gram string, n_grams int"
        )
        post = (
            postings
            if postings is not None
            else trigram_postings(docs, id_col, text_col)
        )
        cands = (
            post.join(F.broadcast(need), "gram")
            .select("pattern_id", "doc_id", "gram", "n_grams")
            .distinct()
            .groupBy("pattern_id", "doc_id", "n_grams")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") == F.col("n_grams"))
            .select("pattern_id", "doc_id")
        )
        t = _norm(F.col(text_col))
        verify = None
        for pid, pat in sorted(patterns.items()):
            if pattern_grams(pat):
                hit = (F.col("pattern_id") == pid) & F.contains(
                    t, F.lit(pat.lower())
                )
                verify = hit if verify is None else verify | hit
        out.append(
            docs.join(
                cands, docs[id_col] == cands["doc_id"], "inner"
            )
            .filter(verify)
            .select(F.col("pattern_id"), cands["doc_id"])
        )
    for pid in short_ids:
        out.append(
            like_search(docs, patterns[pid], id_col=id_col, text_col=text_col)
            .select(F.lit(int(pid)).alias("pattern_id"), "doc_id")
        )
    if not out:
        return docs.limit(0).select(
            F.lit(0).cast("long").alias("pattern_id"),
            F.col(id_col).alias("doc_id"),
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


def like_search(
    docs: DataFrame,
    pattern: str,
    postings: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """doc_ids whose text contains ``pattern`` (case-insensitive).
    With ``postings`` the corpus is pruned through the index; without,
    or for patterns < 3 chars, it is the honest full scan."""
    contains = F.contains(_norm(F.col(text_col)), F.lit(pattern.lower()))
    grams = pattern_grams(pattern)
    if postings is None or not grams:
        return docs.filter(contains).select(F.col(id_col).alias("doc_id"))
    g = F.broadcast(
        docs.sparkSession.createDataFrame([(x,) for x in grams], "gram string")
    )
    cands = (
        postings.join(g, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") == len(grams))
        .select("doc_id")
    )
    # semi-join back for the verify; candidate set size rides the
    # rarest gram, so let AQE pick broadcast vs shuffle
    return (
        docs.join(cands, docs[id_col] == cands["doc_id"], "left_semi")
        .filter(contains)
        .select(F.col(id_col).alias("doc_id"))
    )
