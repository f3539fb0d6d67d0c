"""Dead-letter reprocessing (operators/merge.py reprocess_quarantine)."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from datax_spark.icetable.table import IceTable
from datax_spark.operators.merge import apply_epoch, reprocess_quarantine

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


def _fix_ops(df):
    # the repair rule: legacy op code 'X' means upsert
    return df.withColumn(
        "op", F.when(F.col("op") == "X", "I").otherwise(F.col("op"))
    )


def test_repair_reingest_archive_and_leftovers(spark, tmp_path):
    table = IceTable.create(spark, tmp_path / "t", PAGE_SCHEMA, num_partitions=2)
    ev = spark.createDataFrame(
        [
            (1, "I", "https://x/ok", None, b"<p>a</p>", "en"),
            (2, "X", "https://x/legacy", None, b"<p>b</p>", "en"),  # dirty op
            (3, "I", None, None, b"<p>c</p>", "en"),               # unfixable
        ],
        EV,
    )
    stats = apply_epoch(table, ev, 0)
    assert stats.rows_dirty == 2
    assert {r["url"] for r in table.read().collect()} == {"https://x/ok"}

    rstats = reprocess_quarantine(table, _fix_ops, epoch=100)
    assert rstats is not None and not rstats.skipped
    # the repaired row landed; the unfixable one did not
    assert {r["url"] for r in table.read().collect()} == {
        "https://x/ok",
        "https://x/legacy",
    }
    # consumed dir archived; the unfixable row re-quarantined under 100
    assert table.quarantine_epochs() == ["epoch=100"]
    assert (table.root / "quarantine_archive" / "epoch=0").exists()
    leftovers = table.read_quarantine().collect()
    assert len(leftovers) == 1 and leftovers[0]["url"] is None


def test_replayed_epoch_skips_and_keeps_quarantine_live(spark, tmp_path):
    table = IceTable.create(spark, tmp_path / "t", PAGE_SCHEMA, num_partitions=2)
    ev = spark.createDataFrame(
        [(2, "X", "https://x/legacy", None, b"<p>b</p>", "en")], EV
    )
    apply_epoch(table, ev, 0)
    assert reprocess_quarantine(table, _fix_ops, epoch=100) is not None
    # crash-replay with the SAME epoch: ledger skips, nothing archived,
    # nothing lost (quarantine is already empty here)
    again = reprocess_quarantine(table, _fix_ops, epoch=100)
    assert again is None  # fully drained: no dirty leftovers existed
    # and the table state is unchanged
    assert {r["url"] for r in table.read().collect()} == {"https://x/legacy"}


def test_jobspec_reprocess_action(spark, tmp_path):
    """The job-spec surface: reader.type icetable_reprocess with the
    spec's transforms as the repair rule (mapValues op remap)."""
    from datax_spark.jobspec import run_batch_job

    table = IceTable.create(spark, tmp_path / "t", PAGE_SCHEMA, num_partitions=2)
    ev = spark.createDataFrame(
        [
            (1, "I", "https://x/ok", None, b"<p>a</p>", "en"),
            (2, "X", "https://x/legacy", None, b"<p>b</p>", "en"),
        ],
        EV,
    )
    apply_epoch(table, ev, 0)
    stats_df = run_batch_job(
        spark,
        {
            "reader": {"type": "icetable_reprocess", "path": str(tmp_path / "t")},
            "transforms": [
                {"op": "mapValues", "col": "op", "mapping": {"X": "I"}}
            ],
        },
    )
    row = stats_df.collect()[0]
    assert row["rows_upserted"] == 1 and row["rows_dirty"] == 0
    assert {r["url"] for r in table.read().collect()} == {
        "https://x/ok",
        "https://x/legacy",
    }
    assert table.quarantine_epochs() == []
    # drained: a second run is a no-op returning an empty stats frame
    assert (
        run_batch_job(
            spark,
            {
                "reader": {
                    "type": "icetable_reprocess",
                    "path": str(tmp_path / "t"),
                }
            },
        ).count()
        == 0
    )


def test_ledger_replay_skip_keeps_consumed_dirs_live(spark, tmp_path):
    """A reprocess whose epoch is already in the commit ledger is a
    pure no-op: nothing was written, so the consumed quarantine dirs
    MUST stay live (archiving them would lose their rows)."""
    table = IceTable.create(spark, tmp_path / "t", PAGE_SCHEMA, num_partitions=2)
    dirty = spark.createDataFrame([(3, "I", None, None, b"<p>c</p>", "en")], EV)
    apply_epoch(table, dirty, 0)
    clean = spark.createDataFrame(
        [(5, "I", "https://x/ok", None, b"<p>a</p>", "en")], EV
    )
    apply_epoch(table, clean, 500)  # epoch 500 now in the ledger
    assert table.quarantine_epochs() == ["epoch=0"]
    stats = reprocess_quarantine(table, _fix_ops, epoch=500)
    assert stats is not None and stats.skipped and stats.rows_dirty == 0
    # nothing archived, nothing lost
    assert table.quarantine_epochs() == ["epoch=0"]
    assert not (table.root / "quarantine_archive").exists()
    # a fresh epoch still drains (the row stays unfixable → re-queued)
    reprocess_quarantine(table, _fix_ops, epoch=501)
    assert table.quarantine_epochs() == ["epoch=501"]


def test_reprocess_rejects_live_target_epoch(spark, tmp_path):
    """Reusing an epoch that still has a LIVE quarantine directory must
    raise: write_quarantine is idempotent per epoch, so this run's
    re-quarantined leftovers would be silently swallowed."""
    import pytest

    table = IceTable.create(spark, tmp_path / "t", PAGE_SCHEMA, num_partitions=2)
    ev = spark.createDataFrame([(3, "I", None, None, b"<p>c</p>", "en")], EV)
    apply_epoch(table, ev, 0)
    reprocess_quarantine(table, _fix_ops, epoch=100)
    assert table.quarantine_epochs() == ["epoch=100"]
    with pytest.raises(ValueError, match="live quarantine"):
        reprocess_quarantine(table, _fix_ops, epoch=100)
    # the archive never deletes on a name collision either: a second
    # generation of epoch=100 leftovers archives under a .rK suffix
    reprocess_quarantine(table, _fix_ops, epoch=101)
    reprocess_quarantine(table, _fix_ops, epoch=100)  # leftovers live at 100
    reprocess_quarantine(table, _fix_ops, epoch=102)  # consumes + archives 100
    names = sorted(
        p.name for p in (table.root / "quarantine_archive").glob("epoch=100*")
    )
    assert names == ["epoch=100", "epoch=100.r1"]


def test_unfixable_rows_never_loop_lost(spark, tmp_path):
    table = IceTable.create(spark, tmp_path / "t", PAGE_SCHEMA, num_partitions=2)
    ev = spark.createDataFrame([(3, "I", None, None, b"<p>c</p>", "en")], EV)
    apply_epoch(table, ev, 0)
    # two successive reprocesses that can't fix the row: it keeps
    # cycling through live quarantine, never silently dropped
    reprocess_quarantine(table, _fix_ops, epoch=100)
    assert table.quarantine_epochs() == ["epoch=100"]
    reprocess_quarantine(table, _fix_ops, epoch=101)
    assert table.quarantine_epochs() == ["epoch=101"]
    assert table.read_quarantine().count() == 1


def test_e2e_rdbms_sync_quarantine_then_repair(spark, tmp_path):
    """The full DataX-shaped story in one flow: an RDBMS source (real
    embedded Derby) synced into the lake via icetable_merge, one row
    with a broken key routed to quarantine instead of poisoning the
    epoch, then an icetable_reprocess job whose transforms repair the
    key and recover the row — zero rows lost end to end."""
    from datax_spark.jobspec import run_batch_job

    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    db = f"jdbc:derby:{tmp_path}/db;create=true"
    src = spark.createDataFrame(
        [
            ("https://x/a", "en", "alpha"),
            ("https://x/b", "en", "beta"),
            ("", "de", "broken-key"),  # dirty: empty url
        ],
        "url string, lang string, text string",
    )
    src.write.jdbc(db, "pages", properties={"driver": driver})

    table_root = tmp_path / "lake"
    run_batch_job(
        spark,
        {
            "reader": {"type": "jdbc", "jdbcUrl": db, "table": "pages",
                       "driver": driver},
            "writer": {"type": "icetable_merge", "path": str(table_root),
                       "keyColumn": "url", "synthesizeOps": True},
        },
    )
    from datax_spark.icetable.table import IceTable

    tbl = IceTable.load(spark, table_root)
    assert {r["url"] for r in tbl.read().collect()} == {
        "https://x/a", "https://x/b",
    }
    assert tbl.quarantine_epochs() == ["epoch=0"]

    # repair: quarantined rows get a synthetic url derived from text
    stats_df = run_batch_job(
        spark,
        {
            "reader": {"type": "icetable_reprocess", "path": str(table_root)},
            "transforms": [
                {"op": "pad", "col": "url", "side": "l", "len": 24,
                 "pad": "https://fixed/broken-key"},
            ],
        },
    )
    row = stats_df.collect()[0]
    assert row["rows_upserted"] == 1 and row["rows_dirty"] == 0
    assert {r["url"] for r in tbl.read().collect()} == {
        "https://x/a", "https://x/b", "https://fixed/broken-key",
    }
    assert tbl.quarantine_epochs() == []
