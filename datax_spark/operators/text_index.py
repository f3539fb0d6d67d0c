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

Layout at ``root/``:

- ``postings/bucket=*/``  (term, doc_id, tf, dl) rows — the whole
  posting list of a term lives in exactly one bucket, so per-term
  document frequency is computable from the pruned read alone.
- ``meta.json``  n_docs + sum_dl (the ONLY corpus-global stats BM25
  needs; written LAST — a crashed build leaves no loadable index).

Incremental growth: ``add(new_docs)`` appends the new documents'
postings to their buckets and bumps n_docs/sum_dl — BM25 depends only
on additive aggregates (tf, df, N, Σdl), so probe(after adds) is
result-identical to an index built from the union in one shot
(differential-tested). Document UPDATES/DELETES are not supported (ids
must be fresh); rebuild on churn — same contract as the IVF index's
frozen centroids.

Determinism: scores round to 4 decimals with ascending-doc-id
tie-break, identical to bm25_topk, so the two paths and the DuckDB
oracle agree row for row.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datax_spark.operators.retrieval import _tokens

FORMAT = "bm25-postings-v1"


def _postings(docs: DataFrame, id_col: str, text_col: str, n_buckets: int):
    """(term, doc_id, tf, dl, bucket) rows plus the (n_docs, sum_dl)
    stats row — one tokenize pass."""
    base = docs.select(F.col(id_col), _tokens(F.col(text_col)).alias("_toks"))
    rows = (
        base.select(
            id_col, F.size("_toks").alias("dl"), F.explode("_toks").alias("term")
        )
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("_toks")).alias("sum_dl"),
    )
    return rows, stats


class Bm25Index:
    def __init__(self, spark: SparkSession, root: str | Path):
        self.spark = spark
        self.root = Path(root)
        meta_path = self.root / "meta.json"
        if not meta_path.exists():
            raise FileNotFoundError(f"no BM25 index at {self.root}")
        self.meta = json.loads(meta_path.read_text())
        if self.meta.get("format") != FORMAT:
            raise ValueError(f"unknown index format {self.meta.get('format')!r}")

    # ---------------- build ---------------- #
    @staticmethod
    def build(
        docs: DataFrame,
        root: str | Path,
        n_buckets: int = 64,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> "Bm25Index":
        root = Path(root)
        spark = docs.sparkSession
        rows, stats = _postings(docs, id_col, text_col, n_buckets)
        rows.write.mode("overwrite").partitionBy("bucket").parquet(
            str(root / "postings")
        )
        s = stats.collect()[0]
        (root / "meta.json").write_text(
            json.dumps(
                {
                    "format": FORMAT,
                    "n_buckets": n_buckets,
                    "id_col": id_col,
                    "text_col": text_col,
                    "n_docs": int(s["n_docs"]),
                    "sum_dl": int(s["sum_dl"] or 0),
                },
                indent=2,
            )
        )
        return Bm25Index(spark, root)

    def add(self, new_docs: DataFrame) -> int:
        """Append NEW documents' postings (ids must not already be
        indexed — BM25's aggregates are additive, so union-of-adds is
        one-shot-equal, but a re-added id would double-count its tf).
        Returns the number of documents added."""
        rows, stats = _postings(
            new_docs, self.meta["id_col"], self.meta["text_col"],
            self.meta["n_buckets"],
        )
        rows.write.mode("append").partitionBy("bucket").parquet(
            str(self.root / "postings")
        )
        s = stats.collect()[0]
        self.meta["n_docs"] = int(self.meta["n_docs"]) + int(s["n_docs"])
        self.meta["sum_dl"] = int(self.meta["sum_dl"]) + int(s["sum_dl"] or 0)
        (self.root / "meta.json").write_text(json.dumps(self.meta, indent=2))
        return int(s["n_docs"])

    # ---------------- read side ---------------- #
    def postings(self, buckets: list[int] | None = None) -> DataFrame:
        df = self.spark.read.parquet(str(self.root / "postings"))
        if buckets is not None:
            df = df.filter(F.col("bucket").isin([int(b) for b in buckets]))
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
        tf = self.postings(buckets).join(F.broadcast(needed), "term").select(
            "term", F.col(id_col), "tf", "dl"
        )
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
