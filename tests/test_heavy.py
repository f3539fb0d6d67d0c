"""Heavy hitters (operators/heavy.py): exact vs bounded-memory
candidate path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datax_spark.operators.heavy import top_tokens_candidates, top_tokens_exact


def test_exact_counts_and_tiebreak(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "b c d"), (3, "c d e")],
        "doc_id long, text string",
    )
    got = [(r["term"], r["n"], r["rank"]) for r in top_tokens_exact(docs, k=4).collect()]
    # a=3 b=3 c=3 d=2 e=1; ties break alphabetically
    assert got == [("a", 3, 1), ("b", 3, 2), ("c", 3, 3), ("d", 2, 4)]


@pytest.mark.parametrize("nparts", [1, 7])
def test_candidate_path_matches_exact(spark, sf_dir, nparts):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(nparts)
    exact = top_tokens_exact(docs, k=20).collect()
    cand = top_tokens_candidates(docs, k=20).collect()
    assert [tuple(r) for r in exact] == [tuple(r) for r in cand]


def test_candidate_memory_is_bounded(spark):
    # 2000 distinct rare tokens + 3 heavy ones, m=16 counters: the
    # summary can't hold the rare tail, the heavies must survive
    rows = [(i, f"rare{i} heavyx heavyy") for i in range(2000)]
    rows += [(9000 + i, "heavyz") for i in range(500)]
    docs = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    got = {r["term"] for r in top_tokens_candidates(docs, k=3, m=16).collect()}
    assert got == {"heavyx", "heavyy", "heavyz"}
