"""ADS-style bulk load (DataX S7): IceTable.bulk_overwrite and the
jobspec ``writer.type: icetable`` batch path.

The load must be an atomic snapshot replace that keeps every layout
invariant the incremental CDC path needs to resume on top of it:
url-hash pids, within-partition key sort, key blooms, per-key _lsn.
"""
from __future__ import annotations

from pyspark.sql import types as T

from datax_spark.icetable.table import IceTable
from datax_spark.jobspec import run_batch_job
from datax_spark.operators.merge import apply_epoch

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("val", T.LongType()),
    ]
)


def _load_df(spark, rows):
    return spark.createDataFrame(rows, "url string, val long")


def test_bulk_overwrite_fresh_table(spark, tmp_path):
    t = IceTable.create(spark, tmp_path / "t", SCHEMA, num_partitions=4)
    v = t.bulk_overwrite(
        _load_df(spark, [(f"https://a/{i}", i) for i in range(50)]), epoch=0, base_lsn=7
    )
    assert v == 1
    got = {r["url"]: r["val"] for r in t.read().collect()}
    assert got == {f"https://a/{i}": i for i in range(50)}
    # layout invariants: every file carries a bloom and the load's lsn
    files = t.manifest_entries()
    assert files and all(f.get("bloom") for f in files)
    lsns = {r["_lsn"] for r in t.read(with_lsn=True).select("_lsn").distinct().collect()}
    assert lsns == {7}


def test_bulk_overwrite_replaces_and_time_travels(spark, tmp_path):
    t = IceTable.create(spark, tmp_path / "t", SCHEMA, num_partitions=4)
    t.bulk_overwrite(_load_df(spark, [("https://a/1", 1), ("https://a/2", 2)]), epoch=0)
    v1 = t.current_version()
    t.bulk_overwrite(_load_df(spark, [("https://b/9", 9)]), epoch=1)
    assert {r["url"] for r in t.read().collect()} == {"https://b/9"}
    # time travel to the pre-load snapshot still reads the old rows
    assert {r["url"] for r in t.read(version=v1).collect()} == {
        "https://a/1",
        "https://a/2",
    }


def test_bulk_overwrite_lww_within_load_and_idempotence(spark, tmp_path):
    t = IceTable.create(spark, tmp_path / "t", SCHEMA, num_partitions=4)
    df = spark.createDataFrame(
        [("https://a/1", 10, 5), ("https://a/1", 20, 9), ("https://a/2", 2, 3)],
        "url string, val long, lsn long",
    )
    v = t.bulk_overwrite(df, epoch=0, lsn_col="lsn")
    got = {r["url"]: r["val"] for r in t.read().collect()}
    assert got == {"https://a/1": 20, "https://a/2": 2}
    # replaying the committed epoch is a metadata no-op
    assert t.bulk_overwrite(df, epoch=0, lsn_col="lsn") == v
    assert t.current_version() == v


def test_cdc_merge_resumes_on_bulk_loaded_table(spark, tmp_path):
    """base_lsn stamps the load's logical stream position: later events
    apply, stale ones (lsn <= base_lsn) are LWW-losers."""
    t = IceTable.create(spark, tmp_path / "t", SCHEMA, num_partitions=4)
    t.bulk_overwrite(
        _load_df(spark, [("https://a/1", 1), ("https://a/2", 2)]), epoch=0, base_lsn=100
    )
    events = spark.createDataFrame(
        [
            ("https://a/1", "U", 101, 111),  # newer than the load: applies
            ("https://a/2", "U", 99, 999),  # stale vs base_lsn: ignored
            ("https://a/3", "I", 102, 3),  # new key: inserts
        ],
        "url string, op string, lsn long, val long",
    )
    apply_epoch(t, events, epoch=1, extract=False)
    got = {r["url"]: r["val"] for r in t.read().collect()}
    assert got == {"https://a/1": 111, "https://a/2": 2, "https://a/3": 3}


def test_bulk_overwrite_evolves_schema_additively(spark, tmp_path):
    t = IceTable.create(spark, tmp_path / "t", SCHEMA, num_partitions=4)
    t.bulk_overwrite(_load_df(spark, [("https://a/1", 1)]), epoch=0)
    df = spark.createDataFrame(
        [("https://a/1", 5, "hi")], "url string, val long, note string"
    )
    t.bulk_overwrite(df, epoch=1)
    row = t.read().collect()[0]
    assert row["note"] == "hi"
    assert [f.name for f in t.schema().fields] == ["url", "val", "note"]


def test_jobspec_icetable_writer_bulk_load(spark, tmp_path):
    src = tmp_path / "src"
    _load_df(spark, [(f"https://a/{i}", i) for i in range(20)]).write.parquet(str(src))
    spec = {
        "reader": {"type": "parquet", "path": str(src)},
        "writer": {
            "type": "icetable",
            "path": str(tmp_path / "lake"),
            "keyColumn": "url",
            "numPartitions": 4,
            "baseLsn": 50,
        },
    }
    run_batch_job(spark, spec)
    t = IceTable.load(spark, tmp_path / "lake")
    assert t.read().count() == 20
    assert t.num_partitions == 4
    assert {r["_lsn"] for r in t.read(with_lsn=True).select("_lsn").distinct().collect()} == {50}
