"""Stats-pruned scans (IceTable.plan_scan/scan): per-file column
[min,max] envelopes collected from parquet footers at write time,
file skipping on arbitrary-column predicates, residual exactness vs
read().filter, merge-on-read interaction, and the metrics-off knob."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.icetable.table import IceTable
from datax_spark.operators.merge import apply_epoch

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("val", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
    ]
)

D1 = dt.datetime(2026, 1, 1)
D30 = dt.datetime(2026, 1, 30)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "lsn long, op string, url string, val long, lang string, warc_ts timestamp"
    )


@pytest.fixture()
def table(spark, tmp_path):
    """Two epochs with disjoint val/warc_ts ranges: every partition
    holds one old-range file and one new-range file."""
    t = IceTable.create(spark, tmp_path / "t", SCHEMA, num_partitions=4)
    apply_epoch(
        t,
        _events(
            spark,
            [(i + 1, "I", f"u{i}", i, "en" if i % 2 else "de", D1) for i in range(40)],
        ),
        epoch=0,
        extract=False,
    )
    apply_epoch(
        t,
        _events(
            spark,
            [
                (100 + i, "I", f"w{i}", 1000 + i, "fr", D30)
                for i in range(40)
            ],
        ),
        epoch=1,
        # MoR: epoch-1 files carry ONLY the new rows, so the two
        # epochs' per-file val ranges stay disjoint
        merge_strategy="mor",
    )
    return t


def _urls(df):
    return {r["url"] for r in df.collect()}


def test_stats_recorded_in_manifests(table):
    for e in table.manifest_entries():
        st = e.get("stats")
        assert st is not None
        assert "val" in st and "lang" in st and "warc_ts" in st
        lo, hi = st["val"]
        assert lo <= hi
        assert "url" not in st  # key has its own envelope


def test_numeric_filter_prunes_old_epoch_files(table):
    kept, total = table.plan_scan([("val", ">", 500)])
    assert total == 8 and len(kept) == 4
    assert all(e["stats"]["val"][0] >= 1000 for e in kept)
    got = table.scan([("val", ">", 500)])
    exact = table.read().filter(F.col("val") > 500)
    assert _urls(got) == _urls(exact) and got.count() == 40


def test_timestamp_filter_prunes(table):
    kept, total = table.plan_scan([("warc_ts", "<", dt.datetime(2026, 1, 15))])
    assert len(kept) == 4
    got = table.scan([("warc_ts", "<", dt.datetime(2026, 1, 15))])
    assert _urls(got) == {f"u{i}" for i in range(40)}


def test_string_and_conjunction(table):
    # lang='fr' lives only in the new files; conjunction tightens rows
    kept, _ = table.plan_scan([("lang", "=", "fr")])
    assert len(kept) == 4
    got = table.scan([("lang", "=", "fr"), ("val", "<=", 1004)])
    assert _urls(got) == {f"w{i}" for i in range(5)}


def test_key_column_filter_uses_url_envelope(table):
    # 'u…' and 'w…' sort apart; a key range past every u-file's max
    # prunes via min_url/max_url even with stats untouched
    kept, total = table.plan_scan([("url", ">=", "w")])
    assert len(kept) < total
    got = table.scan([("url", ">=", "w")])
    assert _urls(got) == {f"w{i}" for i in range(40)}


def test_scan_respects_mor_deletes(spark, table):
    apply_epoch(
        table,
        _events(spark, [(500, "D", "w3", None, None, None)]),
        epoch=2,
        merge_strategy="mor",
        extract=False,
    )
    got = table.scan([("val", ">", 500)])
    assert "w3" not in _urls(got)
    assert _urls(got) == _urls(table.read().filter(F.col("val") > 500))


def test_metrics_off_disables_collection_but_scan_stays_exact(spark, tmp_path):
    t = IceTable.create(
        spark,
        tmp_path / "t2",
        SCHEMA,
        num_partitions=2,
        properties={"write.metadata.metrics": "none"},
    )
    apply_epoch(
        t,
        _events(spark, [(i + 1, "I", f"u{i}", i, "en", D1) for i in range(10)]),
        epoch=0,
        extract=False,
    )
    assert all("stats" not in e for e in t.manifest_entries())
    kept, total = t.plan_scan([("val", ">", 5)])
    assert len(kept) == total  # nothing prunable — conservative
    assert _urls(t.scan([("val", ">", 5)])) == {f"u{i}" for i in range(6, 10)}


def test_compaction_preserves_stats(spark, table):
    table.compact(min_files=2)
    for e in table.manifest_entries():
        assert "stats" in e
    got = table.scan([("val", ">", 500)])
    assert got.count() == 40


def test_bad_filters_raise(table):
    with pytest.raises(ValueError, match="unsupported filter op"):
        table.plan_scan([("val", "like", 1)])
    with pytest.raises(ValueError, match="unknown column"):
        table.plan_scan([("nope", "=", 1)])
    with pytest.raises(ValueError, match="NULL literal"):
        table.plan_scan([("val", "=", None)])
