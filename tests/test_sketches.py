"""Approximate sketches vs exact answers — error-bound gates.

No SQL oracle (HLL/KLL internals differ per engine); the gate is the
published error bound against the exact computation on the same data.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("t"))
    row = toks.agg(
        F.countDistinct("t").alias("exact"),
        F.approx_count_distinct("t", rsd=0.02).alias("approx"),
    ).collect()[0]
    rel = abs(row["approx"] - row["exact"]) / row["exact"]
    assert rel < 0.06  # 3x the 2% rsd — a deterministic-sketch sanity belt


def test_approx_percentile_within_accuracy(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    row = ev.agg(
        F.percentile("value", 0.5).alias("exact"),
        F.percentile_approx("value", 0.5, 10000).alias("approx"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    # GK bound: rank error <= n/accuracy; translate to a loose value gap
    # via the empirical spread near the median
    lo, hi = ev.agg(
        F.percentile("value", 0.49), F.percentile("value", 0.51)
    ).collect()[0]
    assert lo <= row["approx"] <= hi or abs(row["approx"] - row["exact"]) < (hi - lo)


def test_hll_groupwise_agrees_on_small_groups(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    per = (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx"),
        )
        .collect()
    )
    for r in per:  # 150 users/group: tiny cardinalities must be near-exact
        assert abs(r["approx"] - r["exact"]) <= max(2, 0.03 * r["exact"])
