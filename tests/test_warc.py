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
