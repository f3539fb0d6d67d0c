"""Bucketed tables: co-located joins run exchange-free
(sources/bucketed.py)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from datax_spark.sources.bucketed import cobucketed_join, write_bucketed


@pytest.fixture()
def tables(spark):
    a = f"buck_a_{uuid.uuid4().hex[:8]}"
    b = f"buck_b_{uuid.uuid4().hex[:8]}"
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("x")
    )
    right = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") + 7).alias("y")
    )
    write_bucketed(left, a, ["k"], 8, sort_cols=["k"])
    write_bucketed(right, b, ["k"], 8, sort_cols=["k"])
    yield a, b
    spark.sql(f"DROP TABLE IF EXISTS {a}")
    spark.sql(f"DROP TABLE IF EXISTS {b}")


def test_cobucketed_join_has_no_exchange(spark, tables):
    a, b = tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # sorted-bucket scans are conf-gated since SPARK-28169; safe here
    # because write_bucketed guarantees one file per bucket
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        j = cobucketed_join(spark, a, b, ["k"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        # matched sortBy also elides the per-side sort
        assert plan.count("Sort ") == 0
        assert j.count() == 500
        got = {r["k"]: (r["x"], r["y"]) for r in j.where(F.col("k") < 3).collect()}
        assert got == {0: (0, 7), 1: (2, 8), 2: (4, 9)}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")


def test_bucketed_groupby_has_no_exchange(spark, tables):
    a, _ = tables
    agg = spark.table(a).groupBy("k").agg(F.sum("x").alias("sx"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_mismatched_bucket_count_still_correct(spark, tables):
    a, _ = tables
    c = f"buck_c_{uuid.uuid4().hex[:8]}"
    right = spark.range(0, 100).select(F.col("id").alias("k"), F.lit(1).alias("z"))
    write_bucketed(right, c, ["k"], 4)
    try:
        j = cobucketed_join(spark, a, c, ["k"])
        assert j.count() == 100  # correctness never depends on the layout
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {c}")
