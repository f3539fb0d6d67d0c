"""Sampling operators (operators/sampling.py): stability and budget
semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datax_spark.operators.sampling import (
    deterministic_sample,
    token_budget_sample,
)


def test_sample_membership_is_stable_under_corpus_changes(spark):
    full = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    sampled_full = {r["doc_id"] for r in deterministic_sample(full, 0.3).collect()}
    # remove half the corpus: every surviving key keeps its membership
    half = full.filter(F.col("doc_id") % 2 == 0)
    sampled_half = {r["doc_id"] for r in deterministic_sample(half, 0.3).collect()}
    assert sampled_half == {d for d in sampled_full if d % 2 == 0}
    # fraction lands near target (md5 is uniform)
    assert 0.25 < len(sampled_full) / 2000 < 0.35


def test_sample_fraction_bounds(spark):
    df = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    assert deterministic_sample(df, 0.0).count() == 0
    assert deterministic_sample(df, 1.0).count() == 10
    with pytest.raises(ValueError):
        deterministic_sample(df, 1.5)


def test_token_budget_priority_and_first_doc_guarantee(spark):
    rows = [
        # source a: quality order b4(0.9) -> 2(0.8) -> 7(0.8) -> 1(0.2)
        (4, "a", 50, 0.9),
        (2, "a", 60, 0.8),
        (7, "a", 40, 0.8),
        (1, "a", 30, 0.2),
        # source b: single giant doc exceeds any budget -> still taken
        (9, "b", 500, 0.5),
        (10, "b", 10, 0.4),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens long, quality double"
    )
    kept = {
        r["doc_id"]: r["cum_tokens"]
        for r in token_budget_sample(df, budget_tokens=100).collect()
    }
    # a: 4 (cum 50), 2 (cum 110 — started below budget), then stop:
    # 7 would start at 110 >= 100; 1 likewise
    # b: 9 always taken (first doc), 10 starts at 500 >= 100 -> out
    assert kept == {4: 50, 2: 110, 9: 500}


def test_stratified_sample_per_group_gates(spark):
    from datax_spark.operators.sampling import (
        deterministic_sample,
        stratified_sample,
    )

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(2000)],
        "doc_id long, source string",
    )
    out = stratified_sample(df, {"a": 0.5, "b": 0.1}, by="source")
    rows = out.collect()
    a = [r["doc_id"] for r in rows if r["source"] == "a"]
    b = [r["doc_id"] for r in rows if r["source"] == "b"]
    assert 380 < len(a) < 620 and 40 < len(b) < 160  # ~500 / ~100
    # per-group membership IS the flat deterministic sample of the group
    flat_a = {r["doc_id"] for r in
              deterministic_sample(df.filter("source = 'a'"), 0.5).collect()}
    assert set(a) == flat_a
    # unknown groups drop by default; default_fraction overrides
    df2 = df.withColumn("source", F.lit("other"))
    assert stratified_sample(df2, {"a": 0.5}).count() == 0
    kept = stratified_sample(df2, {"a": 0.5}, default_fraction=0.1).count()
    assert 100 < kept < 320
