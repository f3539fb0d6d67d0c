"""Stream-static enrichment: a streaming fact joined per microbatch to
a broadcast static dimension must equal the batch join."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_stream_static_broadcast_join(spark, tmp_path, sf_dir):
    dim = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey").alias("k"), "n_name"
    )
    facts = spark.range(0, 1000).select(
        F.col("id").alias("fid"), (F.col("id") % 25).alias("k")
    )
    src = str(tmp_path / "src")
    facts.coalesce(2).write.parquet(src)

    enriched = (
        spark.readStream.schema("fid long, k long")
        .parquet(src)
        .join(F.broadcast(dim), "k")
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["fid"], r["n_name"])
        for r in spark.sql("SELECT fid, n_name FROM enrich_sink").collect()
    }
    want = {
        (r["fid"], r["n_name"])
        for r in facts.join(dim, "k").select("fid", "n_name").collect()
    }
    assert got == want and len(got) == 1000
