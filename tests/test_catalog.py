"""Name-addressed tables: icetable.catalog.Catalog + jobspec
{"catalog", "table"} endpoint resolution."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from datax_spark.icetable.catalog import Catalog
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


def _seed(spark, t, n=5):
    apply_epoch(
        t,
        spark.createDataFrame(
            [(i + 1, "I", f"https://d/{i}", TS, b"<p>x</p>", "en") for i in range(n)],
            EV,
        ),
        0,
    )


def test_lifecycle_and_defaults(spark, tmp_path):
    cat = Catalog(spark, tmp_path / "wh")
    cat.create_namespace("crawl")
    cat.set_defaults({"write.parquet.compression-codec": "zstd"})
    t = cat.create_table("crawl.pages", PAGE_SCHEMA, num_partitions=4)
    assert cat.list_namespaces() == ["crawl"]
    assert cat.list_tables("crawl") == ["crawl.pages"]
    assert cat.table_exists("crawl.pages")
    # catalog default properties applied at create
    assert t.properties()["write.parquet.compression-codec"] == "zstd"
    _seed(spark, t)
    assert cat.load_table("crawl.pages").read().count() == 5


def test_rename_and_drop(spark, tmp_path):
    cat = Catalog(spark, tmp_path / "wh")
    cat.create_namespace("crawl")
    cat.create_namespace("prod")
    t = cat.create_table("crawl.pages", PAGE_SCHEMA, num_partitions=4)
    _seed(spark, t)
    cat.rename_table("crawl.pages", "prod.pages")
    assert not cat.table_exists("crawl.pages")
    assert cat.load_table("prod.pages").read().count() == 5
    # default drop refuses to destroy bytes: trash, not delete
    cat.drop_table("prod.pages")
    assert not cat.table_exists("prod.pages")
    assert any((tmp_path / "wh" / "_trash").iterdir())


def test_guards(spark, tmp_path):
    cat = Catalog(spark, tmp_path / "wh")
    with pytest.raises(KeyError):
        cat.create_table("nope.t", PAGE_SCHEMA)
    cat.create_namespace("a")
    with pytest.raises(ValueError):
        cat.create_table("bad-ident.t", PAGE_SCHEMA)
    with pytest.raises(ValueError):
        cat.load_table("noname")
    cat.create_table("a.t", PAGE_SCHEMA, num_partitions=2)
    with pytest.raises(FileExistsError):
        cat.create_table("a.t", PAGE_SCHEMA, num_partitions=2)


def test_jobspec_name_addressed_endpoints(spark, tmp_path):
    from datax_spark.jobspec import run_batch_job

    cat = Catalog(spark, tmp_path / "wh")
    cat.create_namespace("crawl")
    t = cat.create_table("crawl.pages", PAGE_SCHEMA, num_partitions=4)
    _seed(spark, t)
    # read by name, write by name: no storage path in the spec
    run_batch_job(
        spark,
        {
            "reader": {
                "type": "icetable",
                "catalog": str(tmp_path / "wh"),
                "table": "crawl.pages",
            },
            "writer": {
                "type": "parquet",
                "path": str(tmp_path / "out"),
                "mode": "overwrite",
            },
        },
    )
    assert spark.read.parquet(str(tmp_path / "out")).count() == 5
