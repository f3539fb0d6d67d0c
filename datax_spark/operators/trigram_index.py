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
    (operators/text_index.py): postings laid out as parquet partitioned
    by ``bucket = pmod(xxhash64(gram), B)``, so a query reads ONLY its
    pattern's grams' buckets (partition-pruned scan, cost tracks the
    pattern, not the corpus). ``add(new_docs)`` appends fresh ids —
    gram postings are purely additive, so search(after adds) ≡ search
    of a one-shot build over the union (differential-tested). Updates/
    deletes: rebuild, same contract as the BM25/IVF artifacts.

    ``meta.json`` is written last — a crashed build leaves no loadable
    index."""

    FORMAT = "trigram-postings-v1"

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
            raise ValueError(f"unknown index format {self.meta.get('format')!r}")

    @staticmethod
    def build(
        docs: DataFrame,
        root,
        n_buckets: int = 64,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> "TrigramIndex":
        import json
        from pathlib import Path

        root = Path(root)
        rows = trigram_postings(docs, id_col, text_col).withColumn(
            "bucket", F.pmod(F.xxhash64("gram"), F.lit(n_buckets))
        )
        rows.write.mode("overwrite").partitionBy("bucket").parquet(
            str(root / "postings")
        )
        (root / "meta.json").write_text(
            json.dumps(
                {
                    "format": TrigramIndex.FORMAT,
                    "n_buckets": n_buckets,
                    "id_col": id_col,
                    "text_col": text_col,
                },
                indent=2,
            )
        )
        return TrigramIndex(docs.sparkSession, root)

    def add(self, new_docs: DataFrame) -> None:
        """Append postings for NEW document ids (a re-added id would
        duplicate its postings; the count-based AND-intersection then
        over-counts — ids must be fresh, like Bm25Index.add)."""
        rows = trigram_postings(
            new_docs, self.meta["id_col"], self.meta["text_col"]
        ).withColumn(
            "bucket", F.pmod(F.xxhash64("gram"), F.lit(self.meta["n_buckets"]))
        )
        rows.write.mode("append").partitionBy("bucket").parquet(
            str(self.root / "postings")
        )

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
        post = spark.read.parquet(str(self.root / "postings")).filter(
            F.col("bucket").isin(buckets)
        )
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
