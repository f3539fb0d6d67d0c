"""Groupwise anomaly flagging (operators/anomaly.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datax_spark.operators.anomaly import (
    iqr_outliers,
    zscore_inliers,
    zscore_outliers,
)


def _df(spark):
    rows = (
        # group g: tight cluster around 10 plus one wild point
        [(i, "g", 10.0 + (i % 5) * 0.1) for i in range(20)]
        + [(99, "g", 1000.0)]
        # group c: constant — sample stddev 0, must flag nothing
        + [(200 + i, "c", 5.0) for i in range(4)]
        # group one: single row — sample stddev NULL, must flag nothing
        + [(300, "one", 7.0)]
    )
    return spark.createDataFrame(rows, "id long, grp string, v double")


def test_zscore_flags_only_the_outlier(spark):
    out = zscore_outliers(_df(spark), "v", ["grp"], k=3.0).collect()
    assert [(r["id"], r["grp"]) for r in out] == [(99, "g")]
    assert out[0]["z"] > 3.0


def test_zscore_constant_and_singleton_groups_flag_nothing(spark):
    df = _df(spark).where(F.col("grp") != "g")
    assert zscore_outliers(df, "v", ["grp"], k=3.0).count() == 0


def test_iqr_flags_match_manual_fences(spark):
    # group g quartiles over {10.0..10.4}x4 + 1000: q1=10.1, q3=10.3,
    # fences [9.8, 10.6] -> only the 1000.0 row is outside
    out = iqr_outliers(_df(spark), "v", ["grp"], k=1.5).collect()
    byid = {r["id"]: r for r in out}
    assert set(byid) == {99}
    assert byid[99]["fence_lo"] == 9.8
    assert byid[99]["fence_hi"] == 10.6


def test_zscore_plan_broadcasts_stats(spark):
    plan = zscore_outliers(
        _df(spark), "v", ["grp"], k=3.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_inliers_complement_and_degenerate_groups_kept(spark):
    df = _df(spark)
    kept = zscore_inliers(df, "v", ["grp"], k=3.0)
    assert kept.columns == df.columns
    ids = {r["id"] for r in kept.collect()}
    # everything except the flagged outlier survives, including the
    # constant group and the singleton group
    assert ids == {r["id"] for r in df.collect()} - {99}


def test_global_stats_empty_group_list(spark):
    df = _df(spark).where(F.col("grp") == "g")
    out = zscore_outliers(df, "v", [], k=3.0).collect()
    assert [r["id"] for r in out] == [99]
    kept = zscore_inliers(df, "v", [], k=3.0)
    assert kept.count() == 20
