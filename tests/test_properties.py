"""Table write properties (IceTable.properties/set_properties):
compression codec and max-records-per-file honored by every data-file
write path, switchable mid-life, carried through commits."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import types as T

from datax_spark.icetable.table import IceTable
from datax_spark.operators.merge import apply_epoch

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("val", T.LongType()),
    ]
)


def _events(spark, rows):
    return spark.createDataFrame(rows, "lsn long, op string, url string, val long")


def _codecs(table):
    """Set of compression codecs across all live data files."""
    out = set()
    for f in table.manifest_entries():
        meta = pq.read_metadata(table.root / f["path"])
        out.add(meta.row_group(0).column(0).compression)
    return out


def test_zstd_codec_applied_and_readable(spark, tmp_path):
    t = IceTable.create(
        spark, tmp_path / "t", SCHEMA, num_partitions=2,
        properties={"write.parquet.compression-codec": "zstd"},
    )
    apply_epoch(
        t, _events(spark, [(1, "I", "a", 1), (2, "I", "b", 2)]), 0, extract=False
    )
    assert _codecs(t) == {"ZSTD"}
    assert {r["url"]: r["val"] for r in t.read().collect()} == {"a": 1, "b": 2}


def test_codec_switch_mid_life_and_compaction_rewrites(spark, tmp_path):
    t = IceTable.create(spark, tmp_path / "t", SCHEMA, num_partitions=2)
    apply_epoch(t, _events(spark, [(1, "I", "a", 1)]), 0, extract=False)
    assert _codecs(t) == {"SNAPPY"}  # Spark default before the switch

    t.set_properties({"write.parquet.compression-codec": "zstd"})
    apply_epoch(t, _events(spark, [(2, "I", "zz", 9)]), 1, extract=False)
    assert _codecs(t) == {"SNAPPY", "ZSTD"}  # mixed codecs read fine
    state = {r["url"]: r["val"] for r in t.read().collect()}
    assert state == {"a": 1, "zz": 9}

    t.compact(min_files=1)  # rewrite folds everything into the new codec
    assert _codecs(t) == {"ZSTD"}
    assert {r["url"]: r["val"] for r in t.read().collect()} == state

    # properties ride every commit and delete via None
    assert t.properties() == {"write.parquet.compression-codec": "zstd"}
    t.set_properties({"write.parquet.compression-codec": None})
    assert t.properties() == {}


def test_max_records_per_file_splits_hot_partition(spark, tmp_path):
    t = IceTable.create(
        spark, tmp_path / "t", SCHEMA, num_partitions=1,
        properties={"write.max-records-per-file": 25},
    )
    rows = [(i + 1, "I", f"u{i:04d}", i) for i in range(100)]
    apply_epoch(t, _events(spark, rows), 0, extract=False)
    files = t.manifest_entries(partition_ids={0})
    assert len(files) >= 4  # 100 rows / 25 cap
    assert all(f["rows"] <= 25 for f in files)
    assert t.read().count() == 100
    # within-file key sort survives the split (min/max stats disjointly
    # ordered once sorted by min_url)
    spans = sorted((f["min_url"], f["max_url"]) for f in files)
    assert all(a[1] <= b[0] for a, b in zip(spans, spans[1:]))
