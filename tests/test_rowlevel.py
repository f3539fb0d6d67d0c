"""Predicate row-level ops (operators/rowlevel.py): DELETE WHERE /
UPDATE SET WHERE as self-generated change events through the
exactly-once merge — idempotence, LSN-race correctness, additive
backfill, and the MoR write path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.icetable.table import IceTable
from datax_spark.operators.merge import apply_epoch
from datax_spark.operators.rowlevel import delete_where, update_where

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("val", T.LongType()),
        T.StructField("lang", T.StringType()),
    ]
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "lsn long, op string, url string, val long, lang string"
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = IceTable.create(spark, tmp_path / "t", SCHEMA, num_partitions=4)
    apply_epoch(
        t,
        _events(
            spark,
            [
                (1, "I", "a", 10, "en"),
                (2, "I", "b", 60, "de"),
                (3, "I", "c", 70, "en"),
                (4, "I", "d", 20, "fr"),
            ],
        ),
        epoch=0,
        extract=False,
    )
    return t


def _state(t):
    return {r["url"]: (r["val"], r["lang"]) for r in t.read().collect()}


def test_delete_where(spark, table):
    stats = delete_where(table, "val > 50", epoch=9000)
    assert stats.rows_in == 2 and not stats.skipped
    assert _state(table) == {"a": (10, "en"), "d": (20, "fr")}
    # idempotent retry: the same epoch is a ledger skip
    again = delete_where(table, "val > 50", epoch=9000)
    assert again.skipped
    assert _state(table) == {"a": (10, "en"), "d": (20, "fr")}


def test_delete_where_zero_matches(spark, table):
    v0 = table.current_version()
    delete_where(table, "val > 1000000000")
    assert _state(table) == {
        "a": (10, "en"), "b": (60, "de"), "c": (70, "en"), "d": (20, "fr")
    }
    # an empty epoch publishes nothing
    assert table.current_version() == v0


def test_update_where_and_lsn_race(spark, table):
    update_where(table, {"val": "val * 10"}, "lang = 'en'", epoch=9001)
    assert _state(table) == {
        "a": (100, "en"), "b": (60, "de"), "c": (700, "en"), "d": (20, "fr")
    }
    # a STALE feed event (lsn below the op's stamp) must lose…
    apply_epoch(
        table, _events(spark, [(4, "U", "a", -1, "en")]), epoch=50, extract=False
    )
    assert _state(table)["a"] == (100, "en")
    # …and a later feed event must win, exactly like any delete/update
    apply_epoch(
        table, _events(spark, [(10**7, "U", "a", 11, "en")]), epoch=51, extract=False
    )
    assert _state(table)["a"] == (11, "en")


def test_backfill_new_column(spark, table):
    """update_where assigning a column the table lacks = additive
    schema-evolution backfill in one epoch."""
    update_where(
        table, {"quality": F.length("lang").cast("long") + F.col("val")}, "true"
    )
    rows = {r["url"]: r["quality"] for r in table.read().collect()}
    assert rows == {"a": 12, "b": 62, "c": 72, "d": 22}
    assert "quality" in [f.name for f in table.schema().fields]


def test_update_key_column_rejected(spark, table):
    with pytest.raises(ValueError, match="key column"):
        update_where(table, {"url": "concat(url, 'x')"}, "true")


def test_delete_mor_writes_delete_files(spark, table):
    """Sparse predicate + MoR: the write is O(matched), an equality
    delete shadows the old copy until compaction."""
    before = len(table.delete_entries())
    delete_where(table, "url = 'b'", merge_strategy="mor")
    assert len(table.delete_entries()) > before
    assert set(_state(table)) == {"a", "c", "d"}
    table.compact(min_files=1)
    assert set(_state(table)) == {"a", "c", "d"}


def test_cli_delete_update(spark, table, tmp_path):
    """table_tool.py delete/update — the ops CLI path in a fresh
    interpreter (the GDPR-purge runbook command)."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    root = str(table.root)

    out = subprocess.run(
        [sys.executable, str(repo / "tools" / "table_tool.py"),
         root, "delete", "lang = 'de'"],
        capture_output=True, text=True, timeout=240, cwd=str(repo),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    out = subprocess.run(
        [sys.executable, str(repo / "tools" / "table_tool.py"),
         root, "update", "val=val + 1000", "url = 'a'"],
        capture_output=True, text=True, timeout=240, cwd=str(repo),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    t2 = IceTable.load(spark, root)
    assert _state(t2) == {"a": (1010, "en"), "c": (70, "en"), "d": (20, "fr")}


def test_changelog_shows_the_ops(spark, table):
    v0 = table.current_version()
    delete_where(table, "url = 'c'")
    update_where(table, {"val": "val + 1"}, "url = 'a'")
    ch = {
        r["url"]: r["_op"]
        for r in table.read_changes(v0).collect()
    }
    assert ch == {"c": "D", "a": "U"}
