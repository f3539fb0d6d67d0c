"""Stream-stream joins: two watermarked streams joined on key + time
bound must equal the batch join restricted by the same bound, and the
state store must actually EVICT rows past the watermark (bounded state
— the property that lets the join run forever at 100 TB/day).
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

T0 = datetime(2024, 5, 1, 12, 0, 0)


def _mk_sides(spark, tmp_path, n=400):
    """Clicks and purchases sharing user keys; purchase happens 0-3
    minutes after the click for matched pairs."""
    clicks = spark.createDataFrame(
        [
            (i, T0 + timedelta(seconds=17 * i), "u%d" % (i % 40))
            for i in range(n)
        ],
        "click_id long, click_ts timestamp, user string",
    )
    buys = spark.createDataFrame(
        [
            (
                1000 + i,
                T0 + timedelta(seconds=17 * i + (i % 180)),
                "u%d" % (i % 40),
            )
            for i in range(0, n, 3)
        ],
        "buy_id long, buy_ts timestamp, user string",
    )
    cdir, bdir = str(tmp_path / "clicks"), str(tmp_path / "buys")
    clicks.coalesce(2).write.parquet(cdir)
    buys.coalesce(2).write.parquet(bdir)
    return clicks, buys, cdir, bdir


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    clicks, buys, cdir, bdir = _mk_sides(spark, tmp_path)

    sc = (
        spark.readStream.schema("click_id long, click_ts timestamp, user string")
        .parquet(cdir)
        .withWatermark("click_ts", "10 minutes")
    )
    sb = (
        spark.readStream.schema("buy_id long, buy_ts timestamp, user string")
        .parquet(bdir)
        .withWatermark("buy_ts", "10 minutes")
    )
    cond = (
        (sc.user == sb.user)
        & (sb.buy_ts >= sc.click_ts)
        & (sb.buy_ts <= sc.click_ts + F.expr("INTERVAL 3 MINUTES"))
    )
    joined = sc.join(sb, cond).select("click_id", "buy_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["click_id"], r["buy_id"])
        for r in spark.sql("SELECT * FROM ssj_sink").collect()
    }
    want = {
        (r["click_id"], r["buy_id"])
        for r in clicks.alias("c")
        .join(
            buys.alias("b"),
            (F.col("c.user") == F.col("b.user"))
            & (F.col("b.buy_ts") >= F.col("c.click_ts"))
            & (
                F.col("b.buy_ts")
                <= F.col("c.click_ts") + F.expr("INTERVAL 3 MINUTES")
            ),
        )
        .select("click_id", "buy_id")
        .collect()
    }
    assert got == want and len(got) > 0


def test_stream_stream_state_is_bounded(spark, tmp_path):
    """Two batches far apart in event time: after the watermark passes,
    batch-1 rows must be evicted from the join state (numRowsTotal in
    the final progress ≪ total rows seen) — the unbounded-state
    footgun the watermark + time-bound exists to prevent."""
    early = [
        (i, T0 + timedelta(seconds=i), "u%d" % (i % 10)) for i in range(200)
    ]
    late = [
        (1000 + i, T0 + timedelta(hours=6, seconds=i), "u%d" % (i % 10))
        for i in range(200)
    ]
    cdir = str(tmp_path / "c")
    spark.createDataFrame(
        early, "click_id long, click_ts timestamp, user string"
    ).coalesce(1).write.parquet(cdir)
    bdir = str(tmp_path / "b")
    spark.createDataFrame(
        [(r[0] + 5000, r[1], r[2]) for r in early],
        "buy_id long, buy_ts timestamp, user string",
    ).coalesce(1).write.parquet(bdir)

    sc = (
        spark.readStream.schema("click_id long, click_ts timestamp, user string")
        .parquet(cdir)
        .withWatermark("click_ts", "5 minutes")
    )
    sb = (
        spark.readStream.schema("buy_id long, buy_ts timestamp, user string")
        .parquet(bdir)
        .withWatermark("buy_ts", "5 minutes")
    )
    cond = (
        (sc.user == sb.user)
        & (sb.buy_ts >= sc.click_ts)
        & (sb.buy_ts <= sc.click_ts + F.expr("INTERVAL 2 MINUTES"))
    )
    q = (
        sc.join(sb, cond)
        .select("click_id", "buy_id")
        .writeStream.format("memory")
        .queryName("ssj_bound_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    def _append(rows, schema, path):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    try:
        q.processAllAvailable()
        # far-future data on BOTH sides — the global watermark is the
        # MIN across inputs, so a single-side advance evicts nothing
        _append(late, "click_id long, click_ts timestamp, user string", cdir)
        _append(
            [(r[0] + 7000, r[1], r[2]) for r in late],
            "buy_id long, buy_ts timestamp, user string",
            bdir,
        )
        q.processAllAvailable()
        # one more tiny batch: eviction applies the watermark the
        # PREVIOUS batch advanced
        t2 = T0 + timedelta(hours=12)
        _append(
            [(9000, t2, "u0")], "click_id long, click_ts timestamp, user string", cdir
        )
        _append([(9001, t2, "u0")], "buy_id long, buy_ts timestamp, user string", bdir)
        q.processAllAvailable()
        p = q.lastProgress
        state_rows = (
            p["stateOperators"][0]["numRowsTotal"]
            if p and p["stateOperators"]
            else None
        )
    finally:
        q.stop()
    # 802 rows entered the join; every early row and the +6h batch are
    # past the watermark after the +12h batch — retained state must be
    # a small remainder, not the full history
    assert state_rows is not None and state_rows < 450
