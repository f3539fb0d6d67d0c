"""Persisted BM25 inverted index: probe == one-shot bm25_topk row for
row, incremental adds == one-shot over the union, probes partition-
prune to the query terms' buckets, and the artifact survives a reload.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datax_spark.operators.retrieval import bm25_topk
from datax_spark.operators.text_index import Bm25Index

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a quick brown dog outpaces a lazy fox"),
    (2, "spark shuffles data between executors"),
    (3, "the fox eats quick snacks"),
    (4, "executors spill data to disk under memory pressure"),
    (5, "lazy evaluation defers the shuffle"),
    (6, "brown bread and quick oats"),
    (7, "dogs and foxes are canids"),
]
QUERIES = [(0, "quick brown fox"), (1, "spark shuffle data"), (2, "lazy dog")]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture()
def queries(spark):
    return spark.createDataFrame(QUERIES, "query_id long, query string")


def _rows(df):
    return sorted(
        (r["query_id"], r["doc_id"], r["score"], r["rank"]) for r in df.collect()
    )


def test_probe_equals_one_shot(spark, tmp_path, docs, queries):
    idx = Bm25Index.build(docs, tmp_path / "idx", n_buckets=8)
    got = _rows(idx.probe(queries, k=3))
    want = _rows(bm25_topk(docs, queries, k=3))
    assert got == want and len(got) > 0


def test_incremental_adds_equal_one_shot(spark, tmp_path, docs, queries):
    first = docs.filter(F.col("doc_id") < 5)
    rest = docs.filter(F.col("doc_id") >= 5)
    idx = Bm25Index.build(first, tmp_path / "idx", n_buckets=8)
    assert idx.add(rest) == 3
    got = _rows(idx.probe(queries, k=3))
    want = _rows(bm25_topk(docs, queries, k=3))
    assert got == want
    # stats grew additively
    assert idx.meta["n_docs"] == 8


def test_reload_from_disk(spark, tmp_path, docs, queries):
    Bm25Index.build(docs, tmp_path / "idx", n_buckets=8)
    idx = Bm25Index(spark, tmp_path / "idx")
    assert _rows(idx.probe(queries, k=3)) == _rows(bm25_topk(docs, queries, k=3))


def test_probe_prunes_to_query_buckets(spark, tmp_path, docs, queries):
    """The postings scan must carry a bucket partition filter — the
    serving cost tracks the query's terms, not the corpus."""
    idx = Bm25Index.build(docs, tmp_path / "idx", n_buckets=64)
    q = idx.probe(queries.limit(1), k=3)
    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted"
    )
    part_lines = [
        ln for ln in plan.splitlines() if "PartitionFilters" in ln
    ]
    assert part_lines and any("bucket" in ln for ln in part_lines), plan
    # and with 64 buckets, a 3-term query reads far fewer than all dirs
    probed = {
        r["bucket"]
        for r in idx.postings(None)
        .select("bucket")
        .distinct()
        .collect()
    }
    assert len(probed) > 3  # corpus spreads over many buckets


def test_bad_format_and_missing_index(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        Bm25Index(spark, tmp_path / "nope")


def test_empty_query_terms(spark, tmp_path, docs):
    """A query with no alnum tokens yields no rows (not a crash)."""
    idx = Bm25Index.build(docs, tmp_path / "idx", n_buckets=8)
    q = docs.sparkSession.createDataFrame(
        [(9, "!!! ???")], "query_id long, query string"
    )
    assert idx.probe(q, k=3).count() == 0
