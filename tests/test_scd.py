"""SCD2 dimension build (operators/scd.py)."""

from __future__ import annotations

from datax_spark.operators.scd import scd2_from_log, scd2_lookup


def _log(spark):
    rows = [
        # key a: runs gold(1-2), silver(3), gold(5-)
        ("a", 1, 10, "gold"), ("a", 2, 11, "gold"), ("a", 3, 12, "silver"),
        ("a", 5, 13, "gold"),
        # key b: single state, with a null attr run before it
        ("b", 1, 14, None), ("b", 2, 15, None), ("b", 4, 16, "bronze"),
    ]
    return spark.createDataFrame(rows, "k string, lsn long, id long, tier string")


def test_runs_collapse_and_intervals(spark):
    dim = scd2_from_log(_log(spark), ["k"], "lsn", ["tier"], tiebreak="id")
    got = {
        (r["k"], r["valid_from"]): (r["tier"], r["valid_to"], r["is_current"])
        for r in dim.collect()
    }
    assert got == {
        ("a", 1): ("gold", 3, False),
        ("a", 3): ("silver", 5, False),
        ("a", 5): ("gold", None, True),
        ("b", 1): (None, 4, False),      # null attrs form a run too
        ("b", 4): ("bronze", None, True),
    }


def test_lookup_point_in_time(spark):
    dim = scd2_from_log(_log(spark), ["k"], "lsn", ["tier"], tiebreak="id")
    at3 = {r["k"]: r["tier"] for r in scd2_lookup(dim, ["k"], 3).collect()}
    assert at3 == {"a": "silver", "b": None}
    at9 = {r["k"]: r["tier"] for r in scd2_lookup(dim, ["k"], 9).collect()}
    assert at9 == {"a": "gold", "b": "bronze"}


def test_single_exchange_plan(spark):
    dim = scd2_from_log(_log(spark), ["k"], "lsn", ["tier"], tiebreak="id")
    plan = dim._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
