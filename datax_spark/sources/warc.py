"""WARC source — read Common-Crawl-style web archives directly.

The engine's target table IS Common-Crawl-shaped pages (BASELINE.json
input_hint), and the archives those pages ship in are WARC files (ISO
28500, public format): a sequence of records, each a small RFC-2822-ish
header block plus a Content-Length-delimited payload; ``response``
records carry a full HTTP response whose body is the page HTML.
Crawl dumps store one gzip MEMBER per record concatenated into a
``.warc.gz`` (so ranges stay seekable) — both that and plain ``.warc``
parse here.

Spark shape: ``spark.read.format("binaryFile")`` lists and distributes
the archive files (one row per file — the standard Spark WARC pattern;
a crawl segment file is ~1 GB, sized to be a task), and an
Arrow-batched ``mapInPandas`` explodes each file into page rows with
typed columns. Parse errors NEVER raise (one truncated archive must
not kill a 100 TB scan): malformed records produce a row with a null
url and the error in ``warc_error`` — exactly what the dirty-routing
quarantine path keys on.

The pure-Python record parser is also used by the datagen writer
(tests round-trip through real bytes) and is independent of Spark.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("warc_error", T.StringType()),
    ]
)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the .warc.gz layout).
    ``gzip.decompress`` already walks members; kept as its own function
    so the format decision is one place."""
    return gzip.decompress(data)


def parse_warc_bytes(data: bytes) -> Iterator[dict]:
    """Yield one dict per WARC record: headers (lowercased keys) +
    ``payload`` bytes. Tolerant of leading noise between records;
    raises ValueError only on a structurally broken record (caller
    converts to an error row)."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while True:
        start = data.find(b"WARC/", pos)
        if start < 0 or start >= n:
            return
        head_end = data.find(b"\r\n\r\n", start)
        if head_end < 0:
            raise ValueError("truncated WARC header block")
        lines = data[start:head_end].split(b"\r\n")
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(b":")
            headers[k.strip().decode("ascii", "replace").lower()] = (
                v.strip().decode("ascii", "replace")
            )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError(f"bad Content-Length in record at {start}") from e
        if length < 0:
            # a negative length would move the cursor BACKWARDS and loop
            # the generator forever on the same record
            raise ValueError(f"negative Content-Length in record at {start}")
        body_start = head_end + 4
        if body_start + length > n:
            raise ValueError("truncated WARC payload")
        yield {**headers, "payload": data[body_start : body_start + length]}
        pos = body_start + length


def split_http_response(payload: bytes) -> tuple[int | None, dict[str, str], bytes]:
    """(status, headers, body) from a raw HTTP response payload."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return None, {}, payload
    head = payload[:sep].split(b"\r\n")
    status: int | None = None
    parts = head[0].split()
    if len(parts) >= 2 and parts[0].startswith(b"HTTP/"):
        try:
            status = int(parts[1])
        except ValueError:
            status = None
    headers: dict[str, str] = {}
    for ln in head[1:]:
        k, _, v = ln.partition(b":")
        headers[k.strip().decode("ascii", "replace").lower()] = (
            v.strip().decode("ascii", "replace")
        )
    return status, headers, payload[sep + 4 :]


def _rows_for_file(path: str, data: bytes, types: tuple[str, ...]) -> Iterator[tuple]:
    import zlib

    try:
        for rec in parse_warc_bytes(data):
            rtype = rec.get("warc-type", "")
            if types and rtype not in types:
                continue
            ts = None
            raw_ts = rec.get("warc-date")
            if raw_ts:
                try:
                    ts = datetime.fromisoformat(raw_ts.replace("Z", "+00:00"))
                    ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
                except ValueError:
                    ts = None
            status, http_headers, body = (None, {}, rec["payload"])
            if rtype == "response":
                status, http_headers, body = split_http_response(rec["payload"])
            yield (
                path,
                rec.get("warc-target-uri"),
                ts,
                rtype,
                http_headers.get("content-type", rec.get("content-type")),
                status,
                bytes(body),
                None,
            )
    except (ValueError, OSError, EOFError, zlib.error) as e:
        # archive-level damage — structural (ValueError) or compression
        # (BadGzipFile is an OSError; truncated members raise EOFError /
        # zlib.error): one error row, scan continues
        yield (path, None, None, None, None, None, None, str(e))


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """WARC archives → one row per record of the requested types:
    (warc_file, url, warc_ts, warc_type, mime, http_status, html,
    warc_error). Pass ``record_types=()`` for every record type
    (request/metadata/warcinfo included)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            rows: list[tuple] = []
            for p, content in zip(pdf["path"], pdf["content"]):
                rows.extend(_rows_for_file(p, bytes(content), record_types))
            yield pd.DataFrame(rows, columns=cols)

    return files.select("path", "content").mapInPandas(explode, WARC_SCHEMA)


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Common Crawl WET archives → (warc_file, url, warc_ts, text,
    warc_error). A WET file is an ordinary WARC whose ``conversion``
    records carry the page's already-extracted UTF-8 text as the raw
    payload (no HTTP envelope) — the cheapest Common Crawl asset to
    bootstrap a text corpus from when re-extraction isn't needed.
    Shares the binaryFile + Arrow-explode scale path (and the
    damage → error-row tolerance) with :func:`read_warc`."""
    from pyspark.sql import functions as F

    df = read_warc(spark, path, record_types=("conversion",))
    return df.select(
        "warc_file",
        "url",
        "warc_ts",
        F.decode(F.col("html"), "UTF-8").alias("text"),
        "warc_error",
    )


def read_wat(spark: SparkSession, path: str) -> DataFrame:
    """Common Crawl WAT archives → (warc_file, url, warc_ts, metadata,
    warc_error). A WAT file is a WARC of ``metadata`` records whose
    payload is a JSON envelope describing the corresponding response
    (headers, extracted links, …); ``metadata`` comes back as the raw
    JSON string — feed it to ``from_json``/``get_json_object`` with
    whatever subset of the (large, crawl-versioned) envelope schema
    the query needs, so the scan itself stays schema-agnostic. Same
    scale path and damage tolerance as :func:`read_warc`/:func:`read_wet`."""
    from pyspark.sql import functions as F

    df = read_warc(spark, path, record_types=("metadata",))
    return df.select(
        "warc_file",
        "url",
        "warc_ts",
        F.decode(F.col("html"), "UTF-8").alias("metadata"),
        "warc_error",
    )


# ------------------------------------------------------------------ #
# writer side (fixtures + export): real bytes, round-tripped in tests
# ------------------------------------------------------------------ #

def build_warc_record(
    url: str,
    ts: datetime,
    html: bytes,
    status: int = 200,
    mime: str = "text/html",
    record_type: str = "response",
) -> bytes:
    http = (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {mime}\r\n"
        f"Content-Length: {len(html)}\r\n\r\n"
    ).encode("ascii") + html
    payload = http if record_type == "response" else html
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {record_type}\r\n"
        f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("ascii")
    return head + payload + b"\r\n\r\n"


def write_warc(path, pages, gzip_members: bool = False) -> None:
    """Write a WARC file from (url, ts, html) triples — one gzip member
    per record when ``gzip_members`` (the .warc.gz crawl layout)."""
    with open(path, "wb") as f:
        for url, ts, html in pages:
            rec = build_warc_record(url, ts, html)
            if gzip_members:
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                    g.write(rec)
                rec = buf.getvalue()
            f.write(rec)
