"""Sampling operators (operators/sampling.py): stability and budget
semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datax_spark.operators.sampling import (
    deterministic_sample,
    token_budget_sample,
    weighted_sample_topk,
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


def test_weighted_sample_topk_deterministic_and_weighted(spark):
    # 2000 docs; weights: doc_id < 200 get weight 1000, the rest 10 —
    # heavy docs are 10% of the corpus but should dominate the sample
    df = spark.createDataFrame(
        [(i, 1000 if i < 200 else 10) for i in range(2000)],
        "doc_id long, n_chars int",
    )
    out = weighted_sample_topk(df, 100)
    ids = [r["doc_id"] for r in out.collect()]
    assert len(ids) == 100 and len(set(ids)) == 100
    heavy = sum(1 for i in ids if i < 200)
    # expected share ≈ 200*1000/(200*1000+1800*10) ≈ 92%
    assert heavy > 70
    # replay-identical (no RNG)
    again = [r["doc_id"] for r in weighted_sample_topk(df, 100).collect()]
    assert ids == again
    # membership of the winners is stable under corpus growth: new rows
    # can displace but never reshuffle existing scores
    bigger = spark.createDataFrame(
        [(i, 1000 if i < 200 else 10) for i in range(4000)],
        "doc_id long, n_chars int",
    )
    s1 = {r["doc_id"]: r["sample_score"] for r in out.collect()}
    s2 = {
        r["doc_id"]: r["sample_score"]
        for r in weighted_sample_topk(bigger, 100).collect()
        if r["doc_id"] in s1
    }
    for k, v in s2.items():
        assert v == s1[k]


def test_weighted_sample_topk_plan_is_takeordered(spark):
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(100)], "doc_id long, n_chars int"
    )
    plan = (
        weighted_sample_topk(df, 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan  # top-k reduce, not a full Sort
