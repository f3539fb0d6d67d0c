"""Write-audit-publish: readers follow the prod tag; a failing audit
rolls the table back to the pre-image and never moves prod; a repaired
batch can re-use the failed epoch number (the rollback restored the
ledger)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from datax_spark.icetable.table import IceTable
from datax_spark.operators.expectations import in_set, min_rows, not_null
from datax_spark.operators.wap import wap_apply, wap_read

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
CHECKS = [not_null("url"), in_set("lang", ["en", "de", "fr"]), min_rows(1)]


def _batch(spark, n, lsn0=1, lang="en", prefix=""):
    return spark.createDataFrame(
        [
            (lsn0 + i, "I", f"https://d{i % 5}.example.com/{prefix}{i}", TS,
             f"<p>page {prefix}{i}</p>".encode(), lang)
            for i in range(n)
        ],
        EV,
    )


def _state(table, **kw):
    return sorted(
        tuple(r[c] for c in sorted(r.asDict())) for r in table.read(**kw).collect()
    )


def test_pass_path_moves_prod(spark, tmp_path):
    t = IceTable.create(spark, tmp_path / "t", PAGE_SCHEMA, num_partitions=4)
    rep = wap_apply(t, _batch(spark, 40), 0, CHECKS)
    assert rep["published"] and all(r["passed"] for r in rep["audit"])
    assert t.refs()["prod"] == rep["version"]
    assert _state(t) == sorted(
        tuple(r[c] for c in sorted(r.asDict())) for r in wap_read(t).collect()
    )
    assert wap_read(t).count() == 40


def test_fail_path_rolls_back_and_epoch_is_reusable(spark, tmp_path):
    t = IceTable.create(spark, tmp_path / "t", PAGE_SCHEMA, num_partitions=4)
    wap_apply(t, _batch(spark, 30), 0, CHECKS)
    prod_before = t.refs()["prod"]
    state_before = _state(t, version="prod")

    bad = _batch(spark, 5, lsn0=1000, lang="zz", prefix="new")  # bad lang
    rep = wap_apply(t, bad, 1, CHECKS)
    assert not rep["published"]
    failed = [r for r in rep["audit"] if not r["passed"]]
    assert failed and failed[0]["constraint"].startswith("in_set")
    # prod never moved; table state rolled back to the pre-image
    assert t.refs()["prod"] == prod_before
    assert _state(t) == state_before
    assert wap_read(t).count() == 30

    # the SAME epoch number is reusable after repair (ledger restored)
    rep2 = wap_apply(
        t, _batch(spark, 5, lsn0=1000, lang="de", prefix="new"), 1, CHECKS
    )
    assert rep2["published"]
    assert wap_read(t).count() == 35
    assert t.refs()["prod"] == rep2["version"]


def test_replayed_epoch_is_noop(spark, tmp_path):
    t = IceTable.create(spark, tmp_path / "t", PAGE_SCHEMA, num_partitions=4)
    wap_apply(t, _batch(spark, 20), 0, CHECKS)
    prod = t.refs()["prod"]
    rep = wap_apply(t, _batch(spark, 20), 0, CHECKS)  # replay
    assert not rep["published"] and rep["stats"].skipped
    assert t.refs()["prod"] == prod


def test_jobspec_wap_gate(spark, tmp_path):
    """writer.wap in an icetable_merge spec: good batch publishes and
    moves prod; bad batch raises, rolls back, prod unmoved."""
    from datax_spark.jobspec import run_batch_job

    feed = tmp_path / "feed.parquet"
    _batch(spark, 12).write.parquet(str(feed))
    spec = {
        "reader": {"type": "parquet", "path": str(feed)},
        "writer": {
            "type": "icetable_merge",
            "path": str(tmp_path / "t"),
            "keyColumn": "url",
            "wap": {
                "constraints": [
                    {"kind": "not_null", "col": "url"},
                    {"kind": "in_set", "col": "lang",
                     "values": ["en", "de", "fr"]},
                ],
            },
        },
    }
    run_batch_job(spark, spec)
    t = IceTable.load(spark, tmp_path / "t")
    assert t.refs()["prod"] == t.resolve_ref("prod")
    assert wap_read(t).count() == 12

    bad = tmp_path / "bad.parquet"
    _batch(spark, 3, lsn0=500, lang="zz", prefix="x").write.parquet(str(bad))
    prod_before = t.refs()["prod"]
    spec_bad = {**spec, "reader": {"type": "parquet", "path": str(bad)}}
    try:
        run_batch_job(spark, spec_bad)
        raise AssertionError("expected wap audit failure")
    except ValueError as e:
        assert "wap audit failed" in str(e)
    t = IceTable.load(spark, tmp_path / "t")
    assert t.refs()["prod"] == prod_before
    assert wap_read(t).count() == 12


def test_affected_only_audit_passes_and_prunes(spark, tmp_path):
    t = IceTable.create(spark, tmp_path / "t", PAGE_SCHEMA, num_partitions=4)
    wap_apply(t, _batch(spark, 40), 0, CHECKS)
    # a small update touching few partitions; audit only those
    up = _batch(spark, 3, lsn0=2000)
    rep = wap_apply(t, up, 1, CHECKS, audit_affected_only=True)
    assert rep["published"]
    assert wap_read(t).count() == 40  # updates, no new keys
