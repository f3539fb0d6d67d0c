"""Event-time windowed aggregation with watermark — the streaming twin
of the board's windowed_event_agg: tumbling window + withWatermark in
append mode finalizes a window exactly once and drops data later than
the watermark.

Batch ordering is made deterministic by materializing batch B only
after the stream has fully drained batch A (file-source discovery order
across pre-existing files is not otherwise guaranteed)."""

from __future__ import annotations

import datetime as dt
import glob
import shutil
import time

from pyspark.sql import functions as F

SCHEMA = "event_id long, ts timestamp, event_type string, value double"


def _stage(spark, tmp_path, name, rows):
    """Write rows as one parquet file and drop it into the stream dir."""
    scratch = tmp_path / f"scratch_{name}"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(scratch))
    (part,) = glob.glob(str(scratch / "part-*.parquet"))
    shutil.copy(part, str(tmp_path / "stream_src" / f"{name}.parquet"))


def test_watermark_window_append(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    t = dt.datetime(2026, 1, 1, 10, 0, 0)

    def at(minutes):
        return t + dt.timedelta(minutes=minutes)

    # batch A: three rows in the 10:00 window, one at 12:05 that will
    # push the watermark (1h delay) to 11:05 — past the 10:00 window end
    _stage(spark, tmp_path, "a", [
        (1, at(0), "click", 1.0),
        (2, at(20), "click", 1.0),
        (3, at(40), "view", 1.0),
        (4, at(125), "click", 1.0),
    ])

    stream = (
        spark.readStream.schema(SCHEMA)
        .parquet(str(src))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("wm_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch B arrives only after A fully drained: an on-time row at
        # 12:10 plus a LATE row for the already-finalized 10:00 window —
        # must be dropped, not double-counted
        _stage(spark, tmp_path, "b", [
            (5, at(130), "view", 1.0),
            (6, at(45), "click", 1.0),  # late: watermark is 11:05
        ])
        q.processAllAvailable()
        # finalized windows surface on the watermark-advancing batch (or
        # a trailing no-data microbatch); give them a bounded beat
        deadline = time.monotonic() + 30
        rows = []
        while time.monotonic() < deadline:
            rows = spark.sql("SELECT * FROM wm_sink").collect()
            if rows:
                break
            time.sleep(0.5)
            q.processAllAvailable()
    finally:
        q.stop()

    got = {(r["ws"], r["event_type"]): r["n"] for r in rows}
    w10 = dt.datetime(2026, 1, 1, 10, 0, 0)
    # the 10:00 window finalized WITHOUT the late row 6
    assert got[(w10, "click")] == 2
    assert got[(w10, "view")] == 1
    # the 12:00 window is still open (watermark never passed 13:00):
    # append mode must not have emitted it
    assert all(ws == w10 for ws, _ in got)
