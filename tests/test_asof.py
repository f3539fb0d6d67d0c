"""As-of join semantics (operators/asof.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datax_spark.operators.asof import asof_join


def _sides(spark):
    left = spark.createDataFrame(
        [(1, "k", 10.0), (2, "k", 5.0), (3, "k", 4.0), (4, "z", 7.0)],
        "id long, k string, t double",
    )
    right = spark.createDataFrame(
        [("k", 5.0, 100, "a"), ("k", 5.0, 101, "b"), ("k", 8.0, 102, "c"),
         ("q", 1.0, 103, "d")],
        "k string, t double, rid long, v string",
    )
    return left, right


def test_backward_inclusive_and_tie(spark):
    left, right = _sides(spark)
    out = {
        r["id"]: (r["t_asof"], r["rid"], r["v"])
        for r in asof_join(
            left, right, ["k"], "t", "t", tiebreak="rid"
        ).collect()
    }
    assert out[1] == (8.0, 102, "c")      # nearest preceding
    assert out[2] == (5.0, 101, "b")      # equality matches; max-rid tie wins
    assert out[3] == (None, None, None)   # nothing at or before t=4
    assert out[4] == (None, None, None)   # key never on right side


def test_forward_direction(spark):
    left, right = _sides(spark)
    out = {
        r["id"]: (r["t_asof"], r["rid"])
        for r in asof_join(
            left, right, ["k"], "t", "t", direction="forward", tiebreak="rid"
        ).collect()
    }
    assert out[3] == (5.0, 101)  # earliest following, tie -> max rid
    assert out[2] == (5.0, 101)  # equality matches forward too
    assert out[1] == (None, None)


def test_tolerance_nulls_far_matches(spark):
    left, right = _sides(spark)
    out = {
        r["id"]: r["rid"]
        for r in asof_join(
            left, right, ["k"], "t", "t", tolerance=2.0, tiebreak="rid"
        ).collect()
    }
    assert out[1] == 102   # gap 2.0 <= 2.0
    assert out[2] == 101   # gap 0
    assert out[3] is None


def test_name_collision_gets_suffix_and_left_rows_preserved(spark):
    left, right = _sides(spark)
    right = right.withColumnRenamed("v", "t2").withColumnRenamed("rid", "id")
    out = asof_join(left, right, ["k"], "t", "t", tiebreak="id")
    assert "id_asof" in out.columns and "t_asof" in out.columns
    assert out.count() == left.count()


def test_single_exchange_plan(spark):
    left, right = _sides(spark)
    plan = asof_join(
        left, right, ["k"], "t", "t"
    )._jdf.queryExecution().executedPlan().toString()
    # one hash-partitioning exchange on the key feeds the window; the
    # union itself must not shuffle
    assert plan.count("Exchange hashpartitioning") == 1


def test_string_tiebreak_keeps_native_type(spark):
    # a string LSN tiebreak must not be cast to double (review finding):
    # max string wins deterministically
    left = spark.createDataFrame([(1, "k", 10.0)], "id long, k string, t double")
    right = spark.createDataFrame(
        [("k", 5.0, "rA", "a"), ("k", 5.0, "rB", "b")],
        "k string, t double, lsn string, v string",
    )
    out = asof_join(left, right, ["k"], "t", "t", tiebreak="lsn").collect()
    assert out[0]["v"] == "b" and out[0]["lsn"] == "rB"
