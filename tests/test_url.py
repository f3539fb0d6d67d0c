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
