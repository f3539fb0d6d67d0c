"""Snapshot-then-tail bootstrap (Debezium snapshot mode / DMS
full-load-and-cdc): initial bulk load stamped with per-row LSNs, then
the change tail replays OVERLAPPING the snapshot span — the per-key
LSN guard makes the overlap harmless with no special handoff casing,
and the final state is bit-equal to folding the whole log.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from datax_spark.datagen.generator import (
    EventLogSpec,
    generate_event_log,
    reference_apply,
)
from datax_spark.functions.extract import extract_text
from datax_spark.icetable.table import IceTable
from datax_spark.streaming.driver import EpochDriver
from datax_spark.streaming.source import ChangeTailSource

PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def _events(log_dir, shards):
    out = []
    for shard in shards:
        out.extend(pq.read_table(shard).to_pylist())
    return out


def test_bootstrap_then_tail_converges(spark, tmp_path):
    spec = EventLogSpec(
        n_events=3000, n_urls=500, n_domains=10, n_epochs=8,
        evolve_at_epoch=6, dirty_per_epoch=2, seed=11,
    )
    log_dir = tmp_path / "log"
    shards = [tmp_path / "log" / s.split("/")[-1] for s in generate_event_log(log_dir, spec)]

    # the "existing database": fold of the log's first 5 epochs
    snap_state = reference_apply(_events(log_dir, shards[:5]))
    rows = [
        (
            e["url"], e["warc_ts"], e["html"],
            extract_text(e["html"]), e.get("lang"), e["lsn"],
        )
        for e in snap_state.values()
    ]
    snap_df = spark.createDataFrame(
        rows,
        T.StructType(PAGE_SCHEMA.fields + [T.StructField("lsn", T.LongType())]),
    )

    table = IceTable.create(spark, tmp_path / "t", PAGE_SCHEMA, num_partitions=8)
    table.bulk_overwrite(snap_df, epoch=9999, lsn_col="lsn")

    # tail the WHOLE log from offset 0: epochs 0-4 overlap the snapshot
    driver = EpochDriver(
        spark, ChangeTailSource(spark, log_dir), table, tmp_path / "ckpt"
    )
    stats = driver.run()
    assert [s.epoch for s in stats if not s.skipped] == list(range(8))

    expect = reference_apply(_events(log_dir, shards))
    got = {r["url"]: r.asDict() for r in table.read().collect()}
    assert set(got) == set(expect)
    for url, ref in expect.items():
        assert got[url]["text"] == extract_text(ref.get("html")), url
        assert got[url].get("title") == ref.get("title"), url
    # and the lineage/ledger still answers replay: re-run is a no-op
    stats2 = EpochDriver(
        spark, ChangeTailSource(spark, log_dir), table, tmp_path / "ckpt"
    ).run()
    assert all(s.skipped for s in stats2)


def test_bootstrap_overlap_is_per_key_not_global(spark, tmp_path):
    """A key ABSENT from the snapshot (deleted pre-snapshot) whose
    insert lsn is below the snapshot watermark must still replay
    correctly: insert re-applies, the later delete re-removes it —
    convergence is per-key LSN, not a single global low-watermark."""
    import datetime as dt

    EV = "lsn long, op string, url string, warc_ts timestamp, html binary, lang string"
    TS = dt.datetime(2026, 1, 1)
    table = IceTable.create(spark, tmp_path / "t", PAGE_SCHEMA, num_partitions=4)
    # snapshot at L=10: key a (lsn 8) present; key b deleted at lsn 9
    table.bulk_overwrite(
        spark.createDataFrame(
            [("https://a/1", TS, b"<p>a</p>", "a", "en", 8)],
            T.StructType(PAGE_SCHEMA.fields + [T.StructField("lsn", T.LongType())]),
        ),
        epoch=9999,
        lsn_col="lsn",
    )
    from datax_spark.operators.merge import apply_epoch

    # tail replays events 5..12 (overlapping the snapshot span)
    apply_epoch(
        table,
        spark.createDataFrame(
            [
                (5, "I", "https://b/1", TS, b"<p>b</p>", "en"),
                (7, "U", "https://a/1", TS, b"<p>stale</p>", "en"),
                (9, "D", "https://b/1", TS, None, None),
                (12, "U", "https://a/1", TS, b"<p>fresh</p>", "en"),
            ],
            EV,
        ),
        0,
    )
    got = {r["url"]: r["text"] for r in table.read().collect()}
    assert got == {"https://a/1": "fresh"}  # stale U skipped, D replayed
