"""WARC source tests (sources/warc.py): real bytes, both layouts,
damage tolerance, and the bulk-load chain into the lake table."""

from __future__ import annotations

from datetime import datetime

import pytest

from datax_spark.sources.warc import (
    build_warc_record,
    parse_warc_bytes,
    read_warc,
    write_warc,
)

PAGES = [
    ("http://a.example/1", datetime(2017, 1, 1, 12, 0, 0), b"<html><p>alpha</p></html>"),
    ("http://b.example/2", datetime(2017, 1, 2, 13, 30, 0), b"<html><p>beta</p></html>"),
    ("http://c.example/3", datetime(2017, 1, 3, 9, 15, 0), b"\xe2\x82\xac bytes \x00\xff"),
]


def test_pure_parser_roundtrip(tmp_path):
    for gz in (False, True):
        p = tmp_path / ("f.warc.gz" if gz else "f.warc")
        write_warc(p, PAGES, gzip_members=gz)
        recs = list(parse_warc_bytes(p.read_bytes()))
        assert [r["warc-target-uri"] for r in recs] == [u for u, _, _ in PAGES]
        # payload is the full HTTP response; body bytes survive exactly
        assert recs[2]["payload"].endswith(PAGES[2][2])


@pytest.mark.parametrize("gz", [False, True])
def test_read_warc_rows(spark, tmp_path, gz):
    d = tmp_path / "warcs"
    d.mkdir()
    suffix = ".warc.gz" if gz else ".warc"
    write_warc(d / f"a{suffix}", PAGES[:2], gzip_members=gz)
    write_warc(d / f"b{suffix}", PAGES[2:], gzip_members=gz)
    rows = {r["url"]: r for r in read_warc(spark, str(d)).collect()}
    assert set(rows) == {u for u, _, _ in PAGES}
    for url, ts, html in PAGES:
        r = rows[url]
        assert bytes(r["html"]) == html          # byte-exact body
        assert r["warc_ts"] == ts
        assert r["http_status"] == 200
        assert r["mime"] == "text/html"
        assert r["warc_error"] is None


def test_non_response_records_filtered_unless_asked(spark, tmp_path):
    p = tmp_path / "m.warc"
    rec_resp = build_warc_record(*PAGES[0])
    rec_meta = build_warc_record(
        "http://a.example/1", PAGES[0][1], b"fetch-info", record_type="metadata"
    )
    p.write_bytes(rec_resp + rec_meta)
    only_resp = read_warc(spark, str(p)).collect()
    assert [r["warc_type"] for r in only_resp] == ["response"]
    everything = read_warc(spark, str(p), record_types=()).collect()
    assert sorted(r["warc_type"] for r in everything) == ["metadata", "response"]


def test_damaged_archive_yields_error_row_not_crash(spark, tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    write_warc(d / "good.warc", PAGES[:1])
    (d / "bad.warc").write_bytes(build_warc_record(*PAGES[1])[:40])  # truncated
    rows = read_warc(spark, str(d)).collect()
    good = [r for r in rows if r["warc_error"] is None]
    bad = [r for r in rows if r["warc_error"] is not None]
    assert len(good) == 1 and good[0]["url"] == PAGES[0][0]
    assert len(bad) == 1 and bad[0]["url"] is None
    assert "truncated" in bad[0]["warc_error"]


def test_warc_to_lake_bulk_load_spec(spark, tmp_path):
    """The Common-Crawl bootstrap as ONE job spec: warc reader →
    extract-ready page rows → icetable bulk LOAD OVERWRITE."""
    from datax_spark.icetable.table import IceTable
    from datax_spark.jobspec import run_batch_job

    d = tmp_path / "warcs"
    d.mkdir()
    write_warc(d / "seg.warc.gz", PAGES, gzip_members=True)
    run_batch_job(
        spark,
        {
            "reader": {
                "type": "warc",
                "path": str(d),
                "column": ["url", "warc_ts", "html"],
                "where": "http_status = 200 AND url IS NOT NULL",
            },
            "writer": {"type": "icetable", "path": str(tmp_path / "tbl"),
                       "numPartitions": 4},
        },
    )
    t = IceTable.load(spark, tmp_path / "tbl")
    got = {r["url"]: bytes(r["html"]) for r in t.read().collect()}
    assert got == {u: h for u, _, h in PAGES}


def test_recrawl_snapshot_diff_chain(spark, tmp_path):
    """Incremental recrawl: WARC snapshot → minimal event batch →
    exactly-once MERGE. Only churned pages produce events; unvisited
    pages survive (no deletes unless asked)."""
    from datetime import datetime

    from datax_spark.icetable.table import IceTable
    from datax_spark.operators.merge import apply_epoch
    from datax_spark.operators.snapshot_diff import snapshot_to_events
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
    ])
    t = IceTable.create(spark, tmp_path / "tbl", schema, num_partitions=4)
    boot = spark.createDataFrame(
        [(u, ts, h) for u, ts, h in PAGES], "url string, warc_ts timestamp, html binary"
    )
    t.bulk_overwrite(boot, epoch=0)

    # recrawl: page 1 unchanged, page 2 changed, page 3 unvisited, page 4 new
    crawl_dir = tmp_path / "crawl2"
    crawl_dir.mkdir()
    write_warc(
        crawl_dir / "seg.warc.gz",
        [
            PAGES[0],
            (PAGES[1][0], datetime(2017, 2, 1), b"<html><p>beta v2</p></html>"),
            ("http://d.example/4", datetime(2017, 2, 2), b"<html>new</html>"),
        ],
        gzip_members=True,
    )
    snap = read_warc(spark, str(crawl_dir)).filter("url IS NOT NULL").select(
        "url", "warc_ts", "html"
    )
    events = snapshot_to_events(t, snap)
    got = {r["url"]: r["op"] for r in events.collect()}
    # UNCHANGED page emits nothing (warc_ts equal matters: PAGES[0] kept its ts)
    assert got == {PAGES[1][0]: "U", "http://d.example/4": "I"}

    apply_epoch(t, events, epoch=1, extract=False)
    state = {r["url"]: bytes(r["html"]) for r in t.read().collect()}
    assert state[PAGES[1][0]] == b"<html><p>beta v2</p></html>"
    assert state["http://d.example/4"] == b"<html>new</html>"
    assert state[PAGES[2][0]] == PAGES[2][2]  # unvisited page survives

    # full-crawl semantics: deletes for unvisited keys
    events_d = snapshot_to_events(t, snap, emit_deletes=True)
    ops = {r["url"]: r["op"] for r in events_d.collect()}
    assert ops[PAGES[2][0]] == "D"
    apply_epoch(t, events_d, epoch=2, extract=False)
    assert PAGES[2][0] not in {r["url"] for r in t.read().collect()}


def test_recrawl_as_one_job_spec(spark, tmp_path):
    """warc reader → icetable_diff_merge writer: incremental recrawl
    ingestion is one re-runnable spec."""
    from datax_spark.icetable.table import IceTable
    from datax_spark.jobspec import run_batch_job
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
    ])
    t = IceTable.create(spark, tmp_path / "tbl", schema, num_partitions=4)
    t.bulk_overwrite(
        spark.createDataFrame(
            [(u, ts, h) for u, ts, h in PAGES],
            "url string, warc_ts timestamp, html binary",
        ),
        epoch=0,
    )
    d = tmp_path / "crawl"
    d.mkdir()
    from datetime import datetime
    write_warc(d / "seg.warc", [
        (PAGES[0][0], datetime(2017, 3, 1), b"<html>v3</html>"),
    ])
    run_batch_job(spark, {
        "reader": {"type": "warc", "path": str(d),
                   "column": ["url", "warc_ts", "html"],
                   "where": "url IS NOT NULL"},
        "writer": {"type": "icetable_diff_merge", "path": str(tmp_path / "tbl")},
    })
    t2 = IceTable.load(spark, tmp_path / "tbl")
    got = {r["url"]: bytes(r["html"]) for r in t2.read().collect()}
    assert got[PAGES[0][0]] == b"<html>v3</html>"
    assert len(got) == 3  # others untouched


def test_gzip_damage_and_negative_length_become_error_rows(spark, tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "bad.warc.gz").write_bytes(b"\x1f\x8b" + b"garbage not gzip at all")
    evil = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"Content-Length: -1000000\r\n\r\npayload")
    (d / "neg.warc").write_bytes(evil)
    rows = read_warc(spark, str(d)).collect()
    assert len(rows) == 2 and all(r["warc_error"] for r in rows)


def test_snapshot_diff_duplicate_keys_and_evolution(spark, tmp_path):
    from datetime import datetime

    from datax_spark.icetable.table import IceTable
    from datax_spark.operators.snapshot_diff import snapshot_to_events
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("html", T.BinaryType()),
    ])
    t = IceTable.create(spark, tmp_path / "tbl", schema, num_partitions=2)
    t.bulk_overwrite(
        spark.createDataFrame([("u1", b"v1")], "url string, html binary"), epoch=0
    )
    dup = spark.createDataFrame(
        [("u1", b"old", datetime(2017, 1, 1)), ("u1", b"newer", datetime(2017, 2, 1))],
        "url string, html binary, warc_ts timestamp",
    )
    with pytest.raises(ValueError, match="duplicate"):
        snapshot_to_events(t, dup).collect()
    ev = {r["url"]: (r["op"], bytes(r["html"])) for r in
          snapshot_to_events(t, dup, order_col="warc_ts").collect()}
    assert ev["u1"][1] == b"newer"  # latest crawl row wins

    # evolved column: identical html but a NEW non-null column → U event
    snap2 = spark.createDataFrame(
        [("u1", b"v1", "en")], "url string, html binary, lang string"
    )
    ev2 = [r for r in snapshot_to_events(t, snap2).collect()]
    assert [r["op"] for r in ev2] == ["U"] and ev2[0]["lang"] == "en"


def test_snapshot_diff_order_col_tie_is_deterministic(spark, tmp_path):
    """Two snapshot rows with the SAME key and SAME order_col value
    (same URL, same warc_ts in two crawl segments) must pick the same
    winner regardless of input partition order — the window breaks
    the tie on a payload hash, not on arrival order."""
    from datetime import datetime

    from datax_spark.icetable.table import IceTable
    from datax_spark.operators.snapshot_diff import snapshot_to_events
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("html", T.BinaryType()),
    ])
    t = IceTable.create(spark, tmp_path / "tbl", schema, num_partitions=2)
    ts = datetime(2017, 3, 1)
    rows = [("u1", b"alpha", ts), ("u1", b"beta", ts), ("u2", b"solo", ts)]
    winners = []
    for perm in (rows, rows[::-1]):
        snap = spark.createDataFrame(
            perm, "url string, html binary, warc_ts timestamp"
        ).repartition(3)
        ev = {r["url"]: bytes(r["html"]) for r in
              snapshot_to_events(t, snap, order_col="warc_ts").collect()}
        winners.append(ev)
    assert winners[0] == winners[1]
    assert winners[0]["u2"] == b"solo"


def test_read_wet_conversion_records(spark, tmp_path):
    """WET convenience: conversion records decode straight to text
    rows; a damaged archive in the same glob becomes one error row."""
    from datax_spark.sources.warc import build_warc_record, read_wet

    d = tmp_path / "wet"
    d.mkdir()
    pages = [
        ("https://a.example/x", datetime(2026, 1, 2, 3, 4, 5),
         "Extracted text of page one.\nSecond line."),
        ("https://b.example/y", datetime(2026, 1, 2, 3, 4, 6),
         "Unicode: éèê 中文."),
    ]
    with open(d / "crawl.warc.wet", "wb") as f:
        for url, ts, text in pages:
            f.write(build_warc_record(
                url, ts, text.encode("utf-8"), record_type="conversion"
            ))
    (d / "broken.warc.wet").write_bytes(b"WARC/1.0\r\nContent-Length: trash")

    rows = read_wet(spark, str(d / "*.wet")).collect()
    good = {r["url"]: r for r in rows if r["warc_error"] is None}
    assert set(good) == {u for u, _, _ in pages}
    for url, ts, text in pages:
        assert good[url]["text"] == text
        assert good[url]["warc_ts"] == ts
    errs = [r for r in rows if r["warc_error"] is not None]
    assert len(errs) == 1 and errs[0]["url"] is None


def test_read_wat_metadata_records(spark, tmp_path):
    """WAT convenience: metadata records surface their JSON envelope as
    a string column queryable with get_json_object."""
    import json

    from pyspark.sql import functions as F

    from datax_spark.sources.warc import build_warc_record, read_wat

    d = tmp_path / "wat"
    d.mkdir()
    envelope = {"Envelope": {"WARC-Header-Metadata": {
        "WARC-Target-URI": "https://a.example/x"},
        "Payload-Metadata": {"HTTP-Response-Metadata": {
            "HTML-Metadata": {"Links": [
                {"url": "https://b.example/1"}, {"url": "https://c.example/2"},
            ]}}}}}
    with open(d / "crawl.warc.wat", "wb") as f:
        f.write(build_warc_record(
            "https://a.example/x", datetime(2026, 1, 2, 3, 4, 5),
            json.dumps(envelope, sort_keys=True).encode(),
            record_type="metadata",
        ))
    rows = read_wat(spark, str(d / "*.wat")).collect()
    assert len(rows) == 1 and rows[0]["url"] == "https://a.example/x"
    assert json.loads(rows[0]["metadata"]) == envelope
    # the string column is directly queryable JSON
    first_link = (
        read_wat(spark, str(d / "*.wat"))
        .select(F.get_json_object(
            "metadata",
            "$.Envelope.Payload-Metadata.HTTP-Response-Metadata"
            ".HTML-Metadata.Links[0].url").alias("u"))
        .first()["u"]
    )
    assert first_link == "https://b.example/1"
