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


# --------------------------- MERGE INTO --------------------------- #

from datax_spark.operators.rowlevel import merge_into  # noqa: E402


def _source(spark, rows):
    return spark.createDataFrame(rows, "url string, val long, lang string")


def test_merge_into_upsert_star(spark, table):
    # b matched -> updated with source values; e unmatched -> inserted;
    # a/c/d untouched
    stats = merge_into(
        table,
        _source(spark, [("b", 61, "nl"), ("e", 5, "it")]),
        when_matched_update="*",
        epoch=9100,
    )
    assert stats.rows_in == 2 and not stats.skipped
    assert _state(table) == {
        "a": (10, "en"),
        "b": (61, "nl"),
        "c": (70, "en"),
        "d": (20, "fr"),
        "e": (5, "it"),
    }
    # idempotent retry: same epoch is a ledger skip, state unchanged
    again = merge_into(
        table,
        _source(spark, [("b", 999, "xx"), ("e", 999, "xx")]),
        when_matched_update="*",
        epoch=9100,
    )
    assert again.skipped
    assert _state(table)["b"] == (61, "nl")


def test_merge_into_conditional_update_refs_both_sides(spark, table):
    # only update where the source value beats the target's; subset SET
    # keeps the untouched column's TARGET value
    merge_into(
        table,
        _source(spark, [("a", 99, "xx"), ("b", 1, "xx")]),
        when_matched_update={"val": "source.val"},
        when_matched_update_condition="source.val > target.val",
        when_not_matched_insert=None,
        epoch=9101,
    )
    st = _state(table)
    assert st["a"] == (99, "en")  # updated val, kept target lang
    assert st["b"] == (60, "de")  # condition false -> untouched


def test_merge_into_matched_delete_before_update(spark, table):
    # delete clause evaluated first; surviving matches take the update
    merge_into(
        table,
        _source(spark, [("b", 0, "de"), ("c", 71, "en")]),
        when_matched_delete=True,
        when_matched_delete_condition="source.val = 0",
        when_matched_update="*",
        when_not_matched_insert=None,
        epoch=9102,
    )
    st = _state(table)
    assert "b" not in st
    assert st["c"] == (71, "en")


def test_merge_into_insert_only_with_condition(spark, table):
    merge_into(
        table,
        _source(spark, [("a", 1, "xx"), ("x", 2, "it"), ("y", 3, "zz")]),
        when_not_matched_insert="*",
        when_not_matched_insert_condition="source.lang <> 'zz'",
        epoch=9103,
    )
    st = _state(table)
    assert st["a"] == (10, "en")  # matched, no matched clause -> untouched
    assert st["x"] == (2, "it")
    assert "y" not in st  # insert condition false


def test_merge_into_cardinality_violation_raises(spark, table):
    with pytest.raises(ValueError, match="cardinality"):
        merge_into(
            table,
            _source(spark, [("b", 1, "a"), ("b", 2, "b")]),
            when_matched_update="*",
            epoch=9104,
        )


def test_merge_into_schema_evolution_set_new_column(spark, table):
    # SET a column the table doesn't have -> additive evolution;
    # untouched rows read NULL for it
    merge_into(
        table,
        _source(spark, [("a", 10, "en"), ("q", 1, "fr")]),
        when_matched_update={"quality": F.lit(0.9)},
        when_not_matched_insert={
            "val": "source.val",
            "lang": "source.lang",
            "quality": "cast(0.5 as double)",
        },
        epoch=9105,
    )
    rows = {r["url"]: r for r in table.read().collect()}
    assert rows["a"]["quality"] == pytest.approx(0.9)
    assert rows["a"]["val"] == 10  # subset SET kept target payload
    assert rows["q"]["quality"] == pytest.approx(0.5)
    assert rows["b"]["quality"] is None


def test_merge_into_lsn_race_later_feed_wins(spark, table):
    # merge stamps max(_lsn)+1; a feed event with a HIGHER lsn applied
    # afterwards still wins, and a STALE feed event loses
    merge_into(
        table,
        _source(spark, [("a", 50, "en")]),
        when_matched_update="*",
        when_not_matched_insert=None,
        epoch=9106,
    )
    apply_epoch(
        table,
        _events(spark, [(3, "U", "a", 1, "xx"), (100, "U", "d", 21, "fr")]),
        epoch=9107,
        extract=False,
    )
    st = _state(table)
    assert st["a"] == (50, "en")  # lsn 3 is stale vs merge's stamp
    assert st["d"] == (21, "fr")  # lsn 100 beats it


def test_merge_into_no_clause_raises(spark, table):
    with pytest.raises(ValueError, match="no WHEN clause"):
        merge_into(
            table,
            _source(spark, [("a", 1, "x")]),
            when_not_matched_insert=None,
            epoch=9108,
        )
