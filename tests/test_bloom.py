"""Per-file key bloom filters: manifest build + MERGE rewrite pruning."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.icetable.table import IceTable
from datax_spark.operators.merge import apply_epoch

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


def _batch(spark, urls, lsn0, op="I"):
    return spark.createDataFrame(
        [(lsn0 + i, op, u, TS, b"<p>x</p>", "en") for i, u in enumerate(urls)], EV
    )


def test_blooms_written_and_self_consistent(spark, tmp_path):
    table = IceTable.create(spark, tmp_path / "t", PAGE_SCHEMA, num_partitions=2)
    urls = [f"https://a/{i}" for i in range(50)]
    apply_epoch(table, _batch(spark, urls, 1), 0)
    files = table.manifest_entries()
    assert files and all("bloom" in f for f in files)
    # no false negatives: every written url hits its own file's bloom
    keys = spark.createDataFrame([(u,) for u in urls], "url string")
    kept = table.bloom_prune(files, keys)
    assert {f["path"] for f in kept} == {f["path"] for f in files}


def test_bloom_prunes_untouched_files_in_merge(spark, tmp_path):
    """urls 'a/...' and 'c/...' sandwich 'b/...': the epoch-1 batch (all
    b-urls) falls INSIDE epoch-0 files' [min,max] envelopes, so envelope
    pruning keeps them — the bloom must prune them instead (b-urls were
    never written), leaving epoch-0 files intact in the manifest."""
    table = IceTable.create(spark, tmp_path / "t", PAGE_SCHEMA, num_partitions=1)
    e0 = [f"https://a/{i}" for i in range(30)] + [f"https://c/{i}" for i in range(30)]
    apply_epoch(table, _batch(spark, e0, 1), 0)
    files_v1 = {f["path"] for f in table.manifest_entries()}
    assert len(files_v1) == 1

    e1 = [f"https://b/{i}" for i in range(10)]  # inside [a, c] envelope
    stats = apply_epoch(table, _batch(spark, e1, 1000), 1)
    assert not stats.skipped
    files_v2 = {f["path"] for f in table.manifest_entries()}
    # the epoch-0 file survived (bloom-pruned out of the rewrite set)
    assert files_v1 <= files_v2
    assert len(files_v2) == 2
    # correctness: all 70 urls present exactly once
    got = [r["url"] for r in table.read().collect()]
    assert len(got) == len(set(got)) == 70


def test_bloom_sidecars_are_parquet_and_legacy_json_still_probes(spark, tmp_path):
    """Current sidecars are parquet (probed JVM-side); a legacy table
    whose manifest references .bloom.json sidecars must keep probing
    correctly through the driver-built fallback — including a mixed
    manifest (half parquet, half rewritten to json)."""
    import json as _json

    import pyarrow.parquet as _pq

    table = IceTable.create(spark, tmp_path / "t", PAGE_SCHEMA, num_partitions=2)
    urls = [f"https://a/{i}" for i in range(50)]
    apply_epoch(table, _batch(spark, urls, 1), 0)
    files = table.manifest_entries()
    assert all(f["bloom"].endswith(".bloom.parquet") for f in files)

    # rewrite ONE sidecar to the legacy json format in place
    legacy = files[0]
    side = _pq.read_table(str(table.root / legacy["bloom"])).to_pylist()[0]
    payload = {
        "m": side["m"],
        "k": side["k"],
        "words": {str(w): b for w, b in zip(side["word_idx"], side["bits"])},
    }
    jrel = legacy["bloom"].replace(".bloom.parquet", ".bloom.json")
    (table.root / jrel).write_text(_json.dumps(payload))
    legacy["bloom"] = jrel

    keys = spark.createDataFrame([(u,) for u in urls], "url string")
    kept = table.bloom_prune(files, keys)
    # no false negatives on either format: everything still hits
    assert {f["path"] for f in kept} == {f["path"] for f in files}
    # and a miss-only batch prunes both formats' files
    misses = spark.createDataFrame([(f"https://zz/{i}",) for i in range(20)], "url string")
    assert table.bloom_prune(files, misses) == []


def test_bloom_keeps_files_for_updates(spark, tmp_path):
    """An update to an existing url must still rewrite its file."""
    table = IceTable.create(spark, tmp_path / "t", PAGE_SCHEMA, num_partitions=1)
    apply_epoch(table, _batch(spark, ["https://a/1", "https://a/2"], 1), 0)
    old_files = {f["path"] for f in table.manifest_entries()}
    apply_epoch(table, _batch(spark, ["https://a/2"], 100, op="U"), 1)
    new_files = {f["path"] for f in table.manifest_entries()}
    assert old_files.isdisjoint(new_files)  # the touched file was rewritten
    rows = {r["url"]: r for r in table.read(with_lsn=True).collect()}
    assert rows["https://a/2"]["_lsn"] == 100
    assert len(rows) == 2
