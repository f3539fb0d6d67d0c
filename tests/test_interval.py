"""Interval join (operators/interval.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from datax_spark.operators.interval import interval_join

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _at(m):
    return T0 + dt.timedelta(minutes=m)


def _sides(spark):
    pts = spark.createDataFrame(
        [(1, _at(10)), (2, _at(70)), (3, _at(120)), (4, _at(500))],
        "pid long, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            (100, _at(0), _at(60)),     # catches p1
            (200, _at(0), _at(120)),    # catches p1, p2 (p3 excluded: half-open)
            (300, _at(115), _at(125)),  # catches p3
        ],
        "iid long, s timestamp, e timestamp",
    )
    return pts, ivs


def test_containment_and_half_open(spark):
    pts, ivs = _sides(spark)
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(pts, ivs, "ts", "s", "e", bucket=1800).collect()
    )
    assert got == [(1, 100), (1, 200), (2, 200), (3, 300)]


def test_inclusive_end_adds_boundary(spark):
    pts, ivs = _sides(spark)
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(
            pts, ivs, "ts", "s", "e", bucket=1800, inclusive_end=True
        ).collect()
    )
    assert (3, 200) in got and len(got) == 5


def test_bucket_width_never_changes_the_answer(spark):
    pts, ivs = _sides(spark)
    base = None
    for b in (60.0, 907.0, 3600.0, 86400.0):
        got = sorted(
            (r["pid"], r["iid"])
            for r in interval_join(pts, ivs, "ts", "s", "e", bucket=b).collect()
        )
        base = base or got
        assert got == base, f"bucket={b}"


def test_no_cartesian_in_plan(spark):
    pts, ivs = _sides(spark)
    plan = (
        interval_join(pts, ivs, "ts", "s", "e")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
