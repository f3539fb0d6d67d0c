"""Multi-resolution time rollup: the cascade over finer partials must
equal a direct per-grain recompute from the raw rows, and the physical
plan must scan the raw relation once (exchange reuse across the union
branches).
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from datax_spark.operators.rollup_time import time_rollup


@pytest.fixture()
def events(spark):
    rows = []
    # uneven bucket fills on purpose: averages-of-averages would differ
    for i in range(500):
        rows.append(
            (
                datetime(2024, 3, 1 + (i % 3), (i * 7) % 24, (i * 13) % 60, i % 60),
                "t%d" % (i % 2),
                (i * 37) % 101 - 50,
            )
        )
    return spark.createDataFrame(rows, "ts timestamp, etype string, v long")


def _direct(df, grain):
    return df.groupBy(
        F.date_trunc(grain, "ts").alias("bucket_ts"), "etype"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sum_value"),
        F.min("v").alias("min_value"),
        F.max("v").alias("max_value"),
    )


def test_cascade_matches_direct_recompute(spark, events):
    out = time_rollup(events, "ts", ["etype"], "v", ("minute", "hour", "day"))
    for grain in ("minute", "hour", "day"):
        got = {
            (r["bucket_ts"], r["etype"]): (
                r["n"], r["sum_value"], r["min_value"], r["max_value"]
            )
            for r in out.filter(F.col("resolution") == grain).collect()
        }
        want = {
            (r["bucket_ts"], r["etype"]): (
                r["n"], r["sum_value"], r["min_value"], r["max_value"]
            )
            for r in _direct(events, grain).collect()
        }
        assert got == want, grain
    # grain cardinality must collapse monotonically
    sizes = {
        g: out.filter(F.col("resolution") == g).count()
        for g in ("minute", "hour", "day")
    }
    assert sizes["minute"] > sizes["hour"] > sizes["day"]


def test_single_raw_scan_two_exchanges(spark, events, tmp_path):
    """Grain count must not multiply the physical cost: one raw scan
    and exactly two exchanges (raw→finest agg, partials→multi-grain
    merge) for ANY number of resolutions."""
    events.write.mode("overwrite").parquet(str(tmp_path / "probe"))
    src = spark.read.parquet(str(tmp_path / "probe"))
    for grains in (("minute", "hour", "day"), ("hour", "day", "month", "year")):
        out = time_rollup(src, "ts", ["etype"], "v", grains)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        # count the DETAIL entries ("(n) NodeName") — formatted explain
        # prints every node twice (tree + detail)
        assert plan.count(") Scan parquet") == 1, plan
        assert plan.count(") Exchange") == 2, plan


def test_unknown_resolution_raises(spark, events):
    with pytest.raises(ValueError):
        time_rollup(events, "ts", ["etype"], "v", ("fortnight",))
    with pytest.raises(ValueError):
        time_rollup(events, "ts", ["etype"], "v", ())
