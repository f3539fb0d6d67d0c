"""pipeline_report / report_anomalies over the lineage metrics table."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from datax_spark.icetable.table import IceTable
from datax_spark.operators.merge import apply_epoch
from datax_spark.operators.ops_report import pipeline_report, report_anomalies

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


def _batch(spark, rows):
    return spark.createDataFrame(
        [(lsn, op, url, TS, html, "en") for lsn, op, url, html in rows], EV
    )


def _ingest(spark, path):
    t = IceTable.create(spark, path, PAGE_SCHEMA, num_partitions=4)
    apply_epoch(
        t,
        _batch(spark, [(i + 1, "I", f"https://d{i % 3}.example.com/{i}", b"<p>x</p>") for i in range(30)]),
        0,
    )
    apply_epoch(
        t,
        _batch(
            spark,
            [(40, "U", "https://d0.example.com/0", b"<p>y</p>"),
             # dirty: op outside {I,U,D} — quarantined, counted
             (41, "Z", "https://d0.example.com/3", b"<p>z</p>")],
        ),
        1,
    )
    return t


def test_report_matches_lineage_fold(spark, tmp_path):
    t = _ingest(spark, tmp_path / "t")
    rep = {r["epoch"]: r for r in pipeline_report(t).collect()}
    lin = t.read_lineage().collect()
    for e in (0, 1):
        rows = [r for r in lin if r["checkpoint_epoch"] == e]
        assert rep[e]["rows_in"] == sum(r["rows_in"] for r in rows)
        assert rep[e]["rows_dirty"] == sum(r["rows_dirty"] for r in rows)
        assert rep[e]["wall_ms"] == max(r["wall_ms"] for r in rows)
        # spark max skips nulls (a partition untouched this epoch)
        wm = [r["lsn_watermark"] for r in rows if r["lsn_watermark"] is not None]
        assert rep[e]["lsn_watermark"] == max(wm)
        assert rep[e]["in_ledger"] is True
        assert rep[e]["watermark_advanced"] is True
    assert rep[1]["rows_dirty"] == 1 and rep[1]["dirty_ratio"] > 0
    # healthy drive → nothing to page on
    assert report_anomalies(pipeline_report(t)).count() == 0


def test_ledger_without_lineage_is_flagged(spark, tmp_path):
    t = _ingest(spark, tmp_path / "t")
    # simulate metrics loss: commit an epoch with no lineage write
    t.commit(7, {0}, [])
    bad = report_anomalies(pipeline_report(t)).collect()
    assert [r["epoch"] for r in bad] == [7]
    assert bad[0]["in_ledger"] is True and bad[0]["rows_in"] is None


def test_lineage_without_ledger_is_flagged(spark, tmp_path):
    t = _ingest(spark, tmp_path / "t")
    t.write_lineage(
        9,
        [
            {
                "checkpoint_epoch": 9, "partition_id": 0, "start_offset": 0,
                "end_offset": 1, "lsn_watermark": 99, "rows_in": 5,
                "rows_upserted": 5, "rows_deleted": 0, "rows_dirty": 0,
                "commit_id": "none", "wall_ms": 10,
            }
        ],
    )
    bad = {r["epoch"]: r for r in report_anomalies(pipeline_report(t)).collect()}
    assert 9 in bad and bad[9]["in_ledger"] is False
