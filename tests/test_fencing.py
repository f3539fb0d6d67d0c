"""Zombie-driver fencing (IceTable.acquire_writer_lease + the commit
fence check): a superseded writer's commits must fail — either at the
fence check (it read post-takeover metadata) or at the version CAS (it
read pre-takeover metadata) — and the successor must end at the exact
state a single healthy driver reaches."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from datax_spark.icetable.table import (
    IceTable,
    StaleWriterFence,
    TableCommitConflict,
)

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("val", T.LongType()),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(u, v, p, l) for (u, v, p, l) in rows],
        "url string, val long, _pid int, _lsn long",
    )


def _mk(spark, tmp_path, name="t"):
    return IceTable.create(spark, tmp_path / name, SCHEMA, num_partitions=4)


def test_lease_generations_monotone(spark, tmp_path):
    t = _mk(spark, tmp_path)
    assert t.writer_lease() == {"generation": 0}
    assert t.acquire_writer_lease("driver-a") == 1
    t2 = IceTable.load(spark, tmp_path / "t")
    assert t2.acquire_writer_lease("driver-b") == 2
    lease = t.writer_lease()
    assert lease["generation"] == 2 and lease["owner"] == "driver-b"


def test_stale_writer_commit_raises(spark, tmp_path):
    t1 = _mk(spark, tmp_path)
    t1.acquire_writer_lease("driver-a")
    f0 = t1.stage_data_files(_df(spark, [("a", 1, 0, 1)]), epoch=0)
    t1.commit(0, {0}, f0)  # generation current: lands

    t2 = IceTable.load(spark, tmp_path / "t")
    t2.acquire_writer_lease("driver-b")

    f1 = t1.stage_data_files(_df(spark, [("b", 2, 1, 2)]), epoch=1)
    with pytest.raises(StaleWriterFence):
        t1.commit(1, {1}, f1)
    # successor commits the same epoch fine; final state is one row per key
    f1b = t2.stage_data_files(_df(spark, [("b", 2, 1, 2)]), epoch=1)
    t2.commit(1, {1}, f1b)
    rows = {r["url"]: r["val"] for r in t2.read().collect()}
    assert rows == {"a": 1, "b": 2}


def test_race_window_closed_by_version_cas(spark, tmp_path, monkeypatch):
    """The zombie reads metadata BEFORE the takeover lands (so the fence
    check passes on the stale read), and the takeover publishes between
    its read and its publish: the zombie must lose the version CAS —
    there is no interleaving where its commit lands."""
    t1 = _mk(spark, tmp_path)
    t1.acquire_writer_lease("driver-a")
    rival = IceTable.load(spark, tmp_path / "t")

    real_publish = t1._publish
    fired = {"done": False}

    def racing_publish(meta):
        if not fired["done"]:
            fired["done"] = True
            rival.acquire_writer_lease("driver-b")  # takeover mid-commit
        real_publish(meta)

    monkeypatch.setattr(t1, "_publish", racing_publish)
    f0 = t1.stage_data_files(_df(spark, [("a", 1, 0, 1)]), epoch=0)
    with pytest.raises(TableCommitConflict):
        t1.commit(0, {0}, f0)
    # and the retry path cannot sneak it back in: the re-read now sees
    # the new generation and hits the fence instead
    with pytest.raises(StaleWriterFence):
        t1.commit(0, {0}, f0)
    assert rival.writer_lease()["generation"] == 2


def test_unfenced_handles_unaffected(spark, tmp_path):
    """Opt-in: a handle that never acquired a lease commits normally
    even after some other writer acquired one (single-writer tools,
    maintenance jobs) — fencing binds drivers that ASK for it."""
    t1 = _mk(spark, tmp_path)
    t2 = IceTable.load(spark, tmp_path / "t")
    t2.acquire_writer_lease("driver-b")
    f0 = t1.stage_data_files(_df(spark, [("a", 1, 0, 1)]), epoch=0)
    t1.commit(0, {0}, f0)
    assert {r["url"] for r in t1.read().collect()} == {"a"}


def test_driver_takeover_end_to_end(spark, tmp_path):
    """Two EpochDrivers on one table/checkpoint: the successor (with
    fence_owner) finishes the log; the predecessor's next epoch raises
    StaleWriterFence; final state equals the pure-python fold."""
    from datax_spark.datagen.generator import (
        EventLogSpec,
        generate_event_log,
        reference_apply,
    )
    from datax_spark.streaming.driver import EpochDriver
    from datax_spark.streaming.source import ChangeTailSource

    import pyarrow.parquet as pq

    import shutil

    full_dir = tmp_path / "events-full"
    shards = generate_event_log(
        full_dir,
        EventLogSpec(
            n_events=500, n_epochs=5, n_urls=60, n_domains=6, seed=11
        ),
    )
    events_dir = tmp_path / "events"
    events_dir.mkdir()
    for s in shards[:4]:  # the tail grows mid-test; last shard held back
        shutil.copy(s, events_dir)
    page_schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    table = IceTable.create(
        spark, tmp_path / "tbl", page_schema, num_partitions=4
    )
    source = ChangeTailSource(spark, events_dir)
    d1 = EpochDriver(
        spark, source, table, tmp_path / "ckpt", fence_owner="driver-1",
        extract=False,
    )
    d1.run(max_epochs=2)  # driver-1 applies the first half, then stalls

    t2 = IceTable.load(spark, tmp_path / "tbl")
    d2 = EpochDriver(
        spark, ChangeTailSource(spark, events_dir), t2, tmp_path / "ckpt",
        fence_owner="driver-2", extract=False,
    )
    d2.run()  # successor finishes the visible log

    shutil.copy(shards[4], events_dir)  # the tail grows…
    with pytest.raises(StaleWriterFence):
        d1.run()  # …and the woken zombie tries to ingest it: fenced

    d2.run()  # the successor (crash-recovering the zombie's offsets
    # write-ahead if present) ingests the new shard for real

    events = []
    for s in shards:
        events.extend(pq.read_table(s).to_pylist())
    expect = reference_apply(events)
    got = {r["url"]: r for r in t2.read().collect()}
    assert set(got) == set(expect)
    for url, e in expect.items():
        assert got[url]["lang"] == e["lang"]
