"""Metadata tables (icetable/meta_tables.py): files/snapshots/
partitions/refs as DataFrames."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from datax_spark.icetable import meta_tables as M
from datax_spark.icetable.table import IceTable
from datax_spark.operators.merge import apply_epoch

PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)
EV = "lsn long, op string, url string, warc_ts timestamp, html binary, lang string"
TS = dt.datetime(2026, 1, 1)


def _mk(spark, path):
    t = IceTable.create(spark, path, PAGE_SCHEMA, num_partitions=4)
    apply_epoch(
        t,
        spark.createDataFrame(
            [(i + 1, "I", f"https://d{i % 5}.e.com/{i}", TS, b"<p>x</p>", "en") for i in range(40)],
            EV,
        ),
        0,
    )
    apply_epoch(
        t,
        spark.createDataFrame(
            [(100, "U", "https://d0.e.com/0", TS, b"<p>y</p>", "en")], EV
        ),
        1,
        merge_strategy="mor",
    )
    t.tag("prod")
    return t


def test_files_matches_manifests(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    f = M.files(t).collect()
    data = [r for r in f if r["content"] == "data"]
    dels = [r for r in f if r["content"] == "equality-deletes"]
    assert {r["path"] for r in data} == {e["path"] for e in t.manifest_entries()}
    assert len(dels) == len(t.delete_entries()) >= 1
    assert all(r["bytes"] > 0 for r in f)
    assert sum(r["rows"] for r in data) == sum(e["rows"] for e in t.manifest_entries())


def test_snapshots_operations(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.compact()
    ops = {r["version"]: r["operation"] for r in M.snapshots(t).collect()}
    assert ops[t.current_version()] == "compact"
    assert "append/merge" in ops.values()
    # every retained metadata version appears
    import re

    retained = {
        int(p.name[1:].split(".")[0])
        for p in t.meta_dir.glob("v*.metadata.json")
    }
    assert set(ops) == retained


def test_partitions_debt_signals(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    parts = {r["partition_id"]: r for r in M.partitions(t).collect()}
    assert sum(r["data_rows"] for r in parts.values()) == 41  # 40 + MoR copy
    mor_pid = t.delete_entries()[0]["partition_id"]
    assert parts[mor_pid]["n_delete_files"] == 1
    assert parts[mor_pid]["delete_debt"] > 0
    t.compact()
    parts2 = {r["partition_id"]: r for r in M.partitions(t).collect()}
    assert parts2[mor_pid]["delete_debt"] == 0.0
    assert sum(r["data_rows"] for r in parts2.values()) == 40


def test_refs_relation(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    r = {row["name"]: row["version"] for row in M.refs(t).collect()}
    assert r == t.refs()


def test_version_as_of(spark, tmp_path):
    import time

    t = IceTable.create(spark, tmp_path / "t2", PAGE_SCHEMA, num_partitions=2)
    apply_epoch(
        t,
        spark.createDataFrame([(1, "I", "https://a/1", TS, b"<p>1</p>", "en")], EV),
        0,
    )
    v1 = t.current_version()
    mid = time.time()
    time.sleep(0.05)
    apply_epoch(
        t,
        spark.createDataFrame([(2, "I", "https://a/2", TS, b"<p>2</p>", "en")], EV),
        1,
    )
    assert t.version_as_of(mid) == v1
    assert t.version_as_of(time.time()) == t.current_version()
    assert t.read(version=t.version_as_of(mid)).count() == 1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no retained snapshot"):
        t.version_as_of(0.0)
