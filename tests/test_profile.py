"""Table profiler (operators/profile.py)."""

from __future__ import annotations

from datax_spark.operators.profile import profile_table


def test_profile_table(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (2, None, -3.0)],
        ["k", "s", "v"],
    )
    got = {r["col_name"]: r.asDict() for r in profile_table(df).collect()}
    assert set(got) == {"k", "s", "v"}
    k = got["k"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (3, 0, 2)
    assert (k["min_num"], k["max_num"]) == (1.0, 2.0)
    assert k["min_str"] is None and k["max_str"] is None
    s = got["s"]
    assert (s["n_nulls"], s["n_distinct"]) == (1, 2)
    assert (s["min_str"], s["max_str"]) == ("a", "b")
    assert s["min_num"] is None
    v = got["v"]
    assert (v["n_nulls"], v["n_distinct"]) == (1, 2)
    assert (v["min_num"], v["max_num"]) == (-3.0, 1.5)


def test_profile_single_scan(spark):
    df = spark.createDataFrame([(1, "a")], ["k", "s"])
    plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    # one aggregate pass: the input appears in exactly one scan subtree
    # (Expand fans the row out per distinct-agg group, but reads once)
    assert plan.count("Scan ExistingRDD") == 1


def test_profile_approx_mode(spark):
    df = spark.createDataFrame([(i, str(i % 7)) for i in range(100)], ["k", "s"])
    got = {r["col_name"]: r for r in profile_table(df, exact_distinct=False).collect()}
    # HLL++ default rsd is 5% — allow the sketch its tolerance
    assert abs(got["k"]["n_distinct"] - 100) <= 10
    assert got["s"]["n_distinct"] == 7
