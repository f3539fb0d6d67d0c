"""Z-order layout clustering (operators/layout.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datax_spark.operators.layout import (
    minmax_scale,
    zorder_sort,
    zvalue,
    zvalue_sql,
)


def _morton(vals, bits):
    z = 0
    for i, v in enumerate(vals):
        for b in range(bits):
            z |= ((v >> b) & 1) << (b * len(vals) + i)
    return z


def test_zvalue_matches_reference_interleave(spark):
    rows = [(x, y) for x in (0, 1, 3, 7, 200, 255) for y in (0, 5, 129, 255)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y", zvalue(["x", "y"])).collect()
    for r in got:
        assert r["zvalue"] == _morton([r["x"], r["y"]], 8), (r["x"], r["y"])
    assert _morton([3, 0], 2) == 5  # sanity on the reference itself


def test_zvalue_sql_is_the_same_function(spark):
    import duckdb

    rows = [(x, (x * 37) % 256) for x in range(256)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["zvalue"]
        for r in df.select("x", "y", zvalue(["x", "y"])).collect()
    }
    sql = zvalue_sql(["x", "y"])
    for (x, y), z in got.items():
        assert duckdb.sql(
            f"SELECT {sql} FROM (SELECT {x} AS x, {y} AS y)"
        ).fetchone()[0] == z


def test_minmax_scale_bounds_and_clamp(spark):
    df = spark.createDataFrame([(0.0,), (50.0,), (100.0,), (-3.0,), (200.0,)], "v double")
    got = [r["s"] for r in df.select(minmax_scale("v", 0, 100).alias("s")).collect()]
    assert got[0] == 0 and got[2] == 255
    assert got[3] == 0 and got[4] == 255  # out-of-range clamps
    assert 0 <= got[1] <= 255 and got[1] == 128


def test_zorder_shrinks_both_dimensions(spark):
    rows = [(i, i % 256, (i * 37) % 256) for i in range(4096)]
    df = spark.createDataFrame(rows, "id long, x long, y long")

    def spans(d):
        per = (
            d.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(
                (F.max("x") - F.min("x")).alias("sx"),
                (F.max("y") - F.min("y")).alias("sy"),
            )
            .agg(F.avg("sx").alias("ax"), F.avg("sy").alias("ay"))
            .collect()[0]
        )
        return per["ax"], per["ay"]

    zx, zy = spans(zorder_sort(df, zvalue(["x", "y"]), 16))
    ox, oy = spans(df.repartitionByRange(16, F.col("x")).sortWithinPartitions("x"))
    # single-column layout: x tight, y useless (~full range)
    assert ox < 32 and oy > 200
    # z-order: BOTH dimensions skippable
    assert zx < 130 and zy < 130


def test_layout_plan_is_one_range_exchange(spark):
    df = spark.createDataFrame([(i, i, i) for i in range(10)], "id long, x long, y long")
    plan = (
        zorder_sort(df, zvalue(["x", "y"]), 4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange rangepartitioning") == 1
    assert "Exchange hashpartitioning" not in plan


def test_minmax_scale_constant_column_is_bucket_zero(spark):
    df = spark.createDataFrame([(7.0,), (7.0,)], "v double")
    got = [r["s"] for r in df.select(minmax_scale("v", 7, 7).alias("s")).collect()]
    assert got == [0, 0]
