"""URL canonicalization (functions/url.py): frozen-spec cases and the
idempotence property (canon(canon(u)) == canon(u))."""

from __future__ import annotations

from pyspark.sql import functions as F

from datax_spark.functions.url import canonical_url, url_domain, url_parts

CASES = [
    # raw, canon, domain
    ("HTTPS://WWW.Example.COM:443/a/b?utm_source=x&b=2&a=1#frag",
     "https://example.com/a/b?a=1&b=2", "example.com"),
    ("http://example.com:80", "http://example.com/", "example.com"),
    ("http://Example.com/a?gclid=9&ref=z&fbclid=1", "http://example.com/a",
     "example.com"),
    # non-default port kept; only a LEADING www. strips
    ("https://sub.www.site.org:8080/p?z=1&y=2",
     "https://sub.www.site.org:8080/p?y=2&z=1", "sub.www.site.org"),
    # :443 is only default for https — kept on http
    ("http://h.io:443/x", "http://h.io:443/x", "h.io"),
    ("ftp://Files.example.net/pub", "ftp://files.example.net/pub",
     "files.example.net"),
    ("not a url", None, ""),
    ("", None, ""),
]


def test_canonical_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _, _) in enumerate(CASES)], "i long, url string"
    )
    got = {
        r["i"]: (r["c"], r["d"])
        for r in df.select(
            "i",
            canonical_url(F.col("url")).alias("c"),
            url_domain(F.col("url")).alias("d"),
        ).collect()
    }
    for i, (_, canon, domain) in enumerate(CASES):
        assert got[i] == (canon, domain), (i, got[i])


def test_canonicalization_is_idempotent(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _, _) in enumerate(CASES)], "i long, url string"
    )
    once = df.select("i", canonical_url(F.col("url")).alias("url")).filter(
        F.col("url").isNotNull()
    )
    twice = once.select("i", canonical_url(F.col("url")).alias("url2"))
    joined = once.join(twice, "i")
    assert joined.filter(F.col("url") != F.col("url2")).count() == 0
    assert once.count() == sum(1 for _, c, _ in CASES if c is not None)


def test_url_parts_raw_split(spark):
    df = spark.createDataFrame(
        [(0, "HTTPS://Host.com/p/q?a=1#z")], "i long, url string"
    )
    p = df.select(url_parts(F.col("url")).alias("p")).first()["p"]
    assert (p["scheme"], p["host"], p["path"], p["query"]) == (
        "HTTPS", "Host.com", "/p/q", "a=1"
    )


def test_cdc_canonicalize_urls_collapses_variants(spark, tmp_path):
    """Driver integration: with canonicalize_urls=True, tracking-param /
    case / default-port variants of one page share one canonical key
    (LWW across the merged LSN history), non-URL keys quarantine, and
    replay stays a no-op."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from datax_spark.icetable.table import IceTable
    from datax_spark.streaming.driver import EpochDriver
    from datax_spark.streaming.source import ChangeTailSource

    ts = dt.datetime(2026, 1, 1)
    v1, v2, v3 = (b"<html><body>v%d</body></html>" % i for i in (1, 2, 3))
    events = {
        "lsn": [1, 2, 3, 4],
        "op": ["I", "U", "I", "I"],
        "url": [
            "https://www.a.com/p?utm_source=x",   # variant 1
            "HTTPS://A.COM:443/p",                # variant 2, later lsn
            "junk-url",                           # canon -> NULL -> dirty
            "https://b.com/q",
        ],
        "warc_ts": [ts] * 4,
        "html": [v1, v2, v3, v3],
        "lang": ["en"] * 4,
    }
    ev_dir = tmp_path / "ev"
    ev_dir.mkdir()
    pq.write_table(
        pa.table(
            events,
            schema=pa.schema(
                [
                    ("lsn", pa.int64()),
                    ("op", pa.string()),
                    ("url", pa.string()),
                    ("warc_ts", pa.timestamp("us")),
                    ("html", pa.binary()),
                    ("lang", pa.string()),
                ]
            ),
        ),
        ev_dir / "events-e00000.parquet",
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    table = IceTable.create(spark, tmp_path / "t", schema, num_partitions=4)
    drv = EpochDriver(
        spark,
        ChangeTailSource(spark, ev_dir),
        table,
        tmp_path / "ck",
        canonicalize_urls=True,
    )
    stats = drv.run()
    assert len(stats) == 1 and stats[0].rows_dirty == 1
    rows = {r["url"]: r for r in table.read().collect()}
    assert set(rows) == {"https://a.com/p", "https://b.com/q"}
    # the lsn-2 variant wins the merged history
    assert rows["https://a.com/p"]["html"] == v2
    quar = drv.table.read_quarantine().collect()
    assert len(quar) == 1
    # the offending RAW url is preserved for inspection/repair even
    # though the canonical key column is NULL
    assert quar[0]["_raw_url"] == "junk-url" and quar[0]["url"] is None
    assert all(s.skipped for s in drv.replay())
    rep = drv.report()
    assert rep["epochs"] == 1 and rep["rows_in"] == 3 and rep["rows_dirty"] == 1
    assert rep["rows_upserted"] == 2  # two canonical keys survive
    assert rep["dirty_pct"] == 25.0 and rep["events_per_sec"] > 0
