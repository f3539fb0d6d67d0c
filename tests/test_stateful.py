"""Stateful streaming LWW dedup (streaming/stateful.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from datax_spark.datagen.generator import EventLogSpec, generate_event_log
from datax_spark.streaming.stateful import streaming_lww_dedup

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("lang", T.StringType()),
    ]
)


def test_streaming_lww_dedup_state(spark, tmp_path):
    """Across micro-batches (one file per trigger), each key emits only
    events that advance its LSN watermark; the last emission per key is
    the log's final event for that key."""
    spec = EventLogSpec(n_events=300, n_urls=40, n_domains=5, n_epochs=3, seed=21)
    shards = generate_event_log(tmp_path / "ev", spec)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "ev"))
    )
    dedup = streaming_lww_dedup(stream)
    q = (
        dedup.writeStream.format("memory")
        .queryName("lww_dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    out = spark.sql("SELECT * FROM lww_dedup_out").collect()
    assert out, "stateful operator emitted nothing"

    # reference: per-key final lsn over the full log
    import pyarrow.parquet as pq

    events = []
    for p in shards:
        events.extend(pq.read_table(p).to_pylist())
    final_lsn: dict[str, int] = {}
    for e in events:
        final_lsn[e["url"]] = max(final_lsn.get(e["url"], 0), e["lsn"])

    # emissions per key are strictly increasing in lsn (state suppressed
    # late/duplicate events), and the last emission equals the log final
    by_url: dict[str, list[int]] = {}
    for r in sorted(out, key=lambda r: r["lsn"]):
        by_url.setdefault(r["url"], []).append(r["lsn"])
    for url, lsns in by_url.items():
        assert lsns == sorted(set(lsns)), f"non-monotone emissions for {url}"
        assert lsns[-1] == final_lsn[url]
    assert set(by_url) == set(final_lsn)
