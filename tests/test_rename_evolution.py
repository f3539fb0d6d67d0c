"""Rename/drop schema evolution (name-mapping, metadata-only) —
IceTable.rename_column / drop_column.

The format is name-based (no Iceberg field-ids), so a rename records a
name mapping; reads request both generations in one scan and coalesce.
The name-based limitation is loud, not silent: re-introducing a name
that older files still carry bytes under is refused.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

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


def _batch(spark, rows, cols=EV):
    return spark.createDataFrame(rows, cols)


def _ins(i, lsn, lang="en"):
    return (lsn, "I", f"https://d{i % 3}.example.com/{i}", TS, f"<p>page {i}</p>".encode(), lang)


def _mk(spark, path, n=10):
    t = IceTable.create(spark, path, PAGE_SCHEMA, num_partitions=4)
    apply_epoch(t, _batch(spark, [_ins(i, i + 1) for i in range(n)]), 0)
    return t


def test_rename_reads_old_files_and_new_writes(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    v_pre = t.current_version()
    t.rename_column("lang", "language")
    assert [f.name for f in t.schema().fields] == [
        "url", "warc_ts", "html", "text", "language"
    ]
    # old files' values surface under the new name, no rewrite happened
    rows = {r["url"]: r["language"] for r in t.read().collect()}
    assert set(rows.values()) == {"en"} and len(rows) == 10
    # post-rename ingest (batch already uses the new name) mixes fine
    apply_epoch(
        t,
        _batch(
            spark,
            [(100, "I", "https://new.example.com/1", TS, b"<p>n</p>", "fr")],
            "lsn long, op string, url string, warc_ts timestamp, html binary, language string",
        ),
        1,
    )
    rows = {r["url"]: r["language"] for r in t.read().collect()}
    assert rows["https://new.example.com/1"] == "fr" and len(rows) == 11
    # time travel to the pre-rename snapshot shows the old name
    assert "lang" in t.read(version=v_pre).columns
    assert "language" not in t.read(version=v_pre).columns


def test_stale_cdc_batch_with_old_name_still_applies(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.rename_column("lang", "language")
    # upstream lags the rename: batch still says `lang`
    apply_epoch(t, _batch(spark, [_ins(50, 200, lang="de")]), 1)
    rows = {r["url"]: r["language"] for r in t.read().collect()}
    assert rows["https://d2.example.com/50"] == "de"


def test_rename_alone_is_changelog_invisible(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    v = t.current_version()
    t.rename_column("lang", "language")
    assert t.read_changes(v, v + 1).count() == 0
    # and a post-rename update churns exactly its own row
    apply_epoch(t, _batch(spark, [_ins(0, 300, lang="pt")]), 1)
    ch = t.read_changes(v, t.current_version()).collect()
    assert len(ch) == 1 and ch[0]["_op"] == "U" and ch[0]["language"] == "pt"


def test_chained_rename_and_compaction_migrates(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.rename_column("lang", "language")
    t.rename_column("language", "locale")
    assert t.name_mapping()["locale"] == ["language", "lang"]
    rows = {r["url"]: r["locale"] for r in t.read().collect()}
    assert len(rows) == 10 and set(rows.values()) == {"en"}
    # a CoW epoch rewrites its affected files through the mapped read —
    # the physical files it produces carry the CURRENT name
    apply_epoch(
        t,
        _batch(
            spark,
            [(400 + i, "U", f"https://d{i % 3}.example.com/{i}", TS,
              f"<p>page {i} v2</p>".encode(), "en") for i in range(10)],
            EV.replace("lang ", "locale "),
        ),
        1,
        merge_strategy="cow",
    )
    import pyarrow.parquet as pq

    for f in t.manifest_entries():
        names = pq.read_schema(str(t.root / f["path"])).names
        assert "locale" in names and "lang" not in names
    rows = {r["url"]: r["locale"] for r in t.read().collect()}
    assert len(rows) == 10 and set(rows.values()) == {"en"}


def test_drop_column_and_readd_refused(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    v_pre = t.current_version()
    t.drop_column("text")
    assert "text" not in t.read().columns
    assert "text" in t.read(version=v_pre).columns  # time travel keeps it
    # re-adding the dropped name is refused loudly (additive evolution
    # path goes through commit(new_schema))
    evolved = T.StructType(
        [*t.schema().fields, T.StructField("text", T.StringType())]
    )
    with pytest.raises(ValueError, match="resurrect"):
        t.commit(99, set(), [], new_schema=evolved)
    # a fresh name is fine
    ok = T.StructType(
        [*t.schema().fields, T.StructField("body_text", T.StringType())]
    )
    t.commit(99, set(), [], new_schema=ok)


def test_rename_guards(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    with pytest.raises(ValueError, match="key column"):
        t.rename_column("url", "page_url")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("lang", "text")
    with pytest.raises(ValueError, match="no column"):
        t.rename_column("nope", "x")
    t.rename_column("lang", "language")
    with pytest.raises(ValueError, match="previously used"):
        t.rename_column("language", "lang")  # can't reuse the alias


def test_scan_pruning_survives_rename(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=40)
    t.rename_column("lang", "language")
    kept, total = t.plan_scan([("language", "=", "zz")])
    assert total > 0 and len(kept) == 0  # old-name stats still prune
    kept_en, _ = t.plan_scan([("language", "=", "en")])
    assert len(kept_en) == total


def test_purge_on_renamed_table(spark, tmp_path):
    """Purge is key-addressed; a payload-column rename must not confuse
    it — candidate pruning, rewrite and changelog silence all hold on a
    table whose files span both name generations."""
    t = _mk(spark, tmp_path / "t")
    t.rename_column("lang", "language")
    target = "https://d2.example.com/5"
    res = t.purge_keys([target])
    assert res["rows_purged"] >= 1
    for v in range(1, t.current_version() + 1):
        assert all(r["url"] != target for r in t.read(version=v).collect())
