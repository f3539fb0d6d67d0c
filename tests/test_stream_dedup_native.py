"""Native dropDuplicatesWithinWatermark — the built-in twin of the
engine's bounded-state bloom/stateful dedup operators: duplicate keys
arriving within the watermark window are emitted once."""

from __future__ import annotations

import datetime as dt
import glob
import shutil

from pyspark.sql import functions as F

SCHEMA = "k long, ts timestamp, v string"
T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _stage(spark, tmp_path, name, rows):
    scratch = tmp_path / f"sc_{name}"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(scratch))
    (part,) = glob.glob(str(scratch / "part-*.parquet"))
    shutil.copy(part, str(tmp_path / "src" / f"{name}.parquet"))


def test_drop_duplicates_within_watermark(spark, tmp_path):
    (tmp_path / "src").mkdir()

    def at(m):
        return T0 + dt.timedelta(minutes=m)

    _stage(spark, tmp_path, "a", [
        (1, at(0), "first"),
        (2, at(1), "x"),
        (1, at(2), "dup-in-batch"),
    ])

    stream = (
        spark.readStream.schema(SCHEMA)
        .parquet(str(tmp_path / "src"))
        .withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["k"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("ddw_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # a cross-batch duplicate within the watermark window + a new key
        _stage(spark, tmp_path, "b", [
            (1, at(3), "dup-across-batch"),
            (3, at(4), "y"),
        ])
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql("SELECT k, v FROM ddw_sink").collect()
    got = {r["k"]: r["v"] for r in rows}
    assert len(rows) == 3  # each key exactly once
    assert got[1] == "first" and got[2] == "x" and got[3] == "y"
