"""Physical-plan audits (SURVEY.md §7.2: no per-row Python, pushdown
reaches the scan, exchanges are reused where partitioning aligns)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datax_spark.functions.extract import extract_text_udf
from datax_spark.functions.hashing import url_partition


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_and_projection_pushed_to_parquet(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.filter(F.col("l_quantity") < 24).select("l_partkey", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,24.0)" in plan
    # column pruning: the scan reads exactly the two projected columns
    assert "ReadSchema: struct<l_partkey:bigint,l_quantity:double>" in plan


def test_extraction_is_arrow_not_batch_python(spark):
    df = spark.createDataFrame([(b"<html><body>x</body></html>",)], "html binary")
    q = df.select(extract_text_udf(F.col("html")).alias("text"))
    plan = _plan(q)
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_repartition_on_key_aligns_with_pid(spark):
    """murmur3 alignment: after repartition(P, url) every row's storage
    pid equals its physical partition index — the property that lets the
    table writer produce exactly one file per partition without a range
    sample (icetable.stage_data_files)."""
    P = 8
    df = spark.range(500).select(F.concat(F.lit("u"), F.col("id")).alias("url"))
    parts = (
        df.repartition(P, F.col("url"))
        .withColumn("pid", url_partition("url", P))
        .withColumn("spark_pid", F.spark_partition_id())
    )
    mismatched = parts.filter(F.col("pid") != F.col("spark_pid")).count()
    assert mismatched == 0


def test_window_lww_single_shuffle(spark):
    from datax_spark.operators.lww import lww_resolve

    ev = spark.createDataFrame(
        [("u1", 1, "I"), ("u1", 2, "U"), ("u2", 3, "I")], "url string, lsn long, op string"
    )
    plan = _plan(lww_resolve(ev, key="url", order="lsn", strategy="window"))
    # exactly one exchange: the hash partitioning on the key
    assert plan.count("Exchange (") == 1
    # Spark pushes a partial top-1-per-key limit BEFORE the shuffle —
    # the map-side combine that makes window LWW shuffle ~1 row per
    # (mapper, key) instead of every event
    assert "row_number(), 1, Partial" in plan
