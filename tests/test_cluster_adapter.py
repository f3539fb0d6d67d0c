"""Real-cluster adapter compilation tests (datax_spark/cluster.py).

Execution needs a Kafka broker / iceberg-spark-runtime (absent in this
sandbox — same situation as the jdbc reader), so the tests pin the
compiled artifacts: session confs, stream options, and the MERGE /
ALTER SQL text that carries the sink's exactly-once row semantics.
"""

from __future__ import annotations

from datax_spark.cluster import (
    IcebergCatalogConfig,
    IcebergMergePlan,
    KafkaSourcePlan,
    compile_iceberg_writer,
    compile_kafka_reader,
)


def test_catalog_confs():
    confs = IcebergCatalogConfig(
        name="lake", catalog_type="hadoop", warehouse="/w",
        extra={"io-impl": "org.apache.iceberg.aws.s3.S3FileIO"},
    ).session_confs()
    assert confs["spark.sql.catalog.lake"] == "org.apache.iceberg.spark.SparkCatalog"
    assert confs["spark.sql.catalog.lake.type"] == "hadoop"
    assert confs["spark.sql.catalog.lake.warehouse"] == "/w"
    assert confs["spark.sql.catalog.lake.io-impl"].endswith("S3FileIO")
    assert "IcebergSparkSessionExtensions" in confs["spark.sql.extensions"]


def test_merge_sql_carries_the_lsn_guard_and_delete_rules():
    plan = IcebergMergePlan(table="lake.web.pages", key_column="url")
    sql = plan.merge_sql(["url", "warc_ts", "html", "text", "lang"])
    # the three WHEN legs, in match order
    assert "WHEN MATCHED AND b.lsn > t._lsn AND b.op = 'D' THEN DELETE" in sql
    assert "WHEN MATCHED AND b.lsn > t._lsn THEN UPDATE SET" in sql
    assert "WHEN NOT MATCHED AND b.op != 'D' THEN INSERT" in sql
    # lsn watermark persists on the row (replay = per-row no-op)
    assert "t._lsn = b.lsn" in sql
    assert "html, text, lang, _lsn)" in sql  # inserted rows carry it too
    # the key is never in UPDATE SET
    assert "t.url = b.url\n" not in sql.split("ON ")[1].split("WHEN")[1]


def test_merge_sql_enumerates_columns_explicitly():
    """UPDATE SET * / INSERT * would break on pre-evolution replays
    (batch narrower than the target); the SQL must enumerate."""
    sql = IcebergMergePlan(table="t").merge_sql(["url", "lang"])
    assert "UPDATE SET t.lang = b.lang, t._lsn = b.lsn" in sql
    assert "INSERT (url, lang, _lsn) VALUES (b.url, b.lang, b.lsn)" in sql


def test_evolution_sql():
    plan = IcebergMergePlan(table="lake.web.pages")
    assert plan.evolution_sql([]) is None
    sql = plan.evolution_sql([("title", "string"), ("score", "double")])
    assert sql == "ALTER TABLE lake.web.pages ADD COLUMNS (title string, score double)"


def test_kafka_stream_options():
    plan = compile_kafka_reader(
        {
            "type": "kafka",
            "bootstrapServers": "broker-1:9092,broker-2:9092",
            "topic": "cdc.webpages",
            "startingOffsets": "latest",
            "speed": {"recordPerEpoch": 100000},
        }
    )
    opts = plan.stream_options()
    assert opts["kafka.bootstrap.servers"] == "broker-1:9092,broker-2:9092"
    assert opts["subscribe"] == "cdc.webpages"
    assert opts["startingOffsets"] == "latest"
    assert opts["maxOffsetsPerTrigger"] == "100000"  # records_per_epoch analogue
    assert opts["failOnDataLoss"] == "true"


def test_kafka_defaults_omit_unset_throttle():
    opts = KafkaSourcePlan("b:9092", "t").stream_options()
    assert "maxOffsetsPerTrigger" not in opts
    assert opts["startingOffsets"] == "earliest"


def test_writer_vocabulary_round_trip():
    plan = compile_iceberg_writer(
        {"type": "iceberg", "table": "lake.web.pages", "keyColumn": "url"}
    )
    assert plan.table == "lake.web.pages"
    assert plan.key_column == "url"
    assert plan.merge_sql(["url"]).startswith("MERGE INTO lake.web.pages t")


def test_cluster_job_spec_compiles_both_endpoints():
    from datax_spark.cluster import compile_cluster_cdc_job

    src, sink, ckpt = compile_cluster_cdc_job(
        {
            "reader": {"type": "kafka", "bootstrapServers": "b:9092", "topic": "t"},
            "writer": {"type": "iceberg", "table": "lake.db.t"},
            "checkpoint": "/ckpt",
        }
    )
    assert src.topic == "t" and sink.table == "lake.db.t" and ckpt == "/ckpt"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        compile_cluster_cdc_job(
            {"reader": {"type": "change_tail"}, "writer": {"type": "iceberg"}}
        )


def test_resolve_cluster_batch_matches_engine_semantics(spark):
    """The cluster pipeline's transform stage is the engine's own
    split_dirty → LWW → Arrow extraction; this executes offline against
    a real DataFrame: one row per key, max-lsn wins, dirty rows
    dropped, text extracted from the surviving html bytes."""
    import datetime as dt

    from datax_spark.cluster import resolve_cluster_batch
    from datax_spark.functions.extract import extract_text

    ts = dt.datetime(2026, 1, 1)
    rows = [
        (1, "I", "https://a/1", ts, b"<p>old</p>", "en"),
        (5, "U", "https://a/1", ts, b"<p>new</p>", "en"),
        (2, "I", "https://a/2", ts, b"<p>two</p>", "en"),
        (3, "I", None, ts, b"<p>dirty</p>", "en"),  # null key -> dirty
    ]
    batch = spark.createDataFrame(
        rows, "lsn long, op string, url string, warc_ts timestamp, html binary, lang string"
    )
    out = {r["url"]: r for r in resolve_cluster_batch(batch).collect()}
    assert set(out) == {"https://a/1", "https://a/2"}
    assert out["https://a/1"]["lsn"] == 5  # last writer won
    assert out["https://a/1"]["text"] == extract_text(b"<p>new</p>")
    assert out["https://a/2"]["text"] == extract_text(b"<p>two</p>")


def _kafka_jar() -> bool:
    import glob
    import os

    sh = os.environ.get("SPARK_HOME") or ""
    if not sh:
        try:
            import pyspark

            sh = str(Path(pyspark.__file__).parent)
        except Exception:
            return False
    return bool(glob.glob(os.path.join(sh, "jars", "*sql-kafka*")))


import os
from pathlib import Path

import pytest


@pytest.mark.skipif(
    not (os.environ.get("DATAX_KAFKA_BOOTSTRAP") and _kafka_jar()),
    reason="needs a Kafka broker (DATAX_KAFKA_BOOTSTRAP), spark-sql-kafka "
    "and iceberg-spark-runtime jars — absent in the offline sandbox",
)
def test_cluster_cdc_end_to_end(spark, tmp_path):
    """REAL-cluster execution hook (runs only when the environment
    provides a broker + the Kafka/Iceberg jars; compile-path twins above
    run everywhere): produce change events into a topic via Spark's own
    Kafka batch sink, run the bounded cluster CDC job (availableNow),
    and assert the Iceberg table converged to the LWW state.

    Env contract: DATAX_KAFKA_BOOTSTRAP=host:port,
    DATAX_ICEBERG_TABLE=<catalog.db.table> (catalog confs preconfigured
    in spark-defaults), optional DATAX_KAFKA_TOPIC (default dx_e2e)."""
    import json

    from pyspark.sql import functions as F

    from datax_spark.cluster import run_cluster_cdc_job

    bootstrap = os.environ["DATAX_KAFKA_BOOTSTRAP"]
    topic = os.environ.get("DATAX_KAFKA_TOPIC", "dx_e2e")
    table = os.environ.get("DATAX_ICEBERG_TABLE", "lake.db.dx_e2e")
    events = spark.createDataFrame(
        [
            (1, "I", "https://a/1", "2026-01-01T00:00:00", "aGk=", "en"),
            (2, "U", "https://a/1", "2026-01-01T00:00:01", "eW8=", "en"),
            (3, "I", "https://a/2", "2026-01-01T00:00:02", "b2s=", "en"),
        ],
        "lsn long, op string, url string, warc_ts string, html string, lang string",
    )
    (
        events.select(F.to_json(F.struct(*events.columns)).alias("value"))
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )
    spec = {
        "reader": {"type": "kafka", "bootstrapServers": bootstrap, "topic": topic,
                   "startingOffsets": "earliest"},
        "writer": {"type": "iceberg", "table": table},
        "checkpoint": str(tmp_path / "ckpt"),
    }
    schema = events.schema
    run_cluster_cdc_job(spark, spec, schema, extract=False, available_now=True)
    got = {r["url"]: r["lsn"] for r in spark.table(table).collect()}
    assert got["https://a/1"] == 2 and got["https://a/2"] == 3


def test_dry_run_compiles_without_spark(tmp_path):
    """The documented first step on a real cluster: --dry-run validates
    the job.json and prints every artifact the job would hand Spark —
    no SparkSession, broker, or jars involved."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    from datax_spark.cluster import dry_run_cluster_cdc_job

    spec = {
        "reader": {
            "type": "kafka", "bootstrapServers": "broker:9092",
            "topic": "crawl_cdc",
            "eventSchema": "lsn long, op string, url string, "
                           "warc_ts timestamp, html binary, lang string",
            "speed": {"recordPerEpoch": 500000},
        },
        "writer": {
            "type": "iceberg", "table": "lake.crawl.pages",
            "catalog": {"name": "lake", "catalog_type": "hadoop",
                        "warehouse": "s3://bucket/warehouse"},
        },
        "checkpoint": "/ckpt/pages",
    }
    out = dry_run_cluster_cdc_job(spec)
    assert out["kafka_stream_options"]["subscribe"] == "crawl_cdc"
    assert out["kafka_stream_options"]["maxOffsetsPerTrigger"] == "500000"
    assert out["iceberg_session_confs"][
        "spark.sql.catalog.lake.warehouse"] == "s3://bucket/warehouse"
    assert "MERGE INTO lake.crawl.pages" in out["merge_sql"]
    assert "b.lsn > t._lsn" in out["merge_sql"]
    # op/lsn never appear as data columns — they ride the MERGE guard
    assert out["event_columns"] == ["url", "warc_ts", "html", "lang"]
    # the printed MERGE is the statement the job EXECUTES: the resolved
    # batch gains the extract-derived text column when html is present
    assert out["merge_columns"] == ["url", "warc_ts", "html", "lang", "text"]
    assert "t.text = b.text" in out["merge_sql"]
    assert out["checkpoint"] == "/ckpt/pages"
    # malformed spec fails validation exactly like the real run
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dry_run_cluster_cdc_job(
            {"reader": {"type": "change_tail"},
             "writer": {"type": "iceberg"}, "checkpoint": "/x"}
        )
    # the CLI path: submit_job --dry-run prints the same JSON, exit 0
    p = tmp_path / "job.json"
    p.write_text(json.dumps(spec))
    repo = Path(__file__).resolve().parents[1]
    r = subprocess.run(
        [sys.executable, str(repo / "tools" / "submit_job.py"),
         "--dry-run", str(p)],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr
    assert json.loads(r.stdout)["checkpoint"] == "/ckpt/pages"


def test_dry_run_ddl_colon_and_backquoted_forms(spark):
    """StructType.fromDDL accepts 'name:type' as well as 'name TYPE',
    and backquoted names may contain spaces or colons — the dry run's
    SparkSession-free name extractor must resolve the same columns the
    real run's fromDDL does, or the printed MERGE diverges from what
    the job executes."""
    from datax_spark.cluster import dry_run_cluster_cdc_job

    base = {
        "reader": {"type": "kafka", "bootstrapServers": "b:9092",
                   "topic": "t"},
        "writer": {"type": "iceberg", "table": "lake.db.t",
                   "catalog": {"name": "lake", "catalog_type": "hadoop",
                               "warehouse": "/tmp/w"}},
        "checkpoint": "/ckpt/x",
    }
    # colon form, with a nested type containing top-level-looking chars
    base["reader"]["eventSchema"] = (
        "lsn:long, op:string, url:string, tags:array<string>, "
        "meta:struct<a:int,b:string>"
    )
    out = dry_run_cluster_cdc_job(base)
    assert out["event_columns"] == ["url", "tags", "meta"]
    # backquoted names containing a space and a colon; `` escapes one `
    base["reader"]["eventSchema"] = (
        "lsn long, op string, `page url` string, `a:b` int, "
        "`odd``name` string"
    )
    out = dry_run_cluster_cdc_job(base)
    assert out["event_columns"] == ["page url", "a:b", "odd`name"]
    # cross-check against the real parser: fromDDL names must agree
    # (fromDDL needs a live SparkContext, hence the fixture — the
    # dry-run path itself never touches one)
    from pyspark.sql.types import StructType

    for ddl in (
        "lsn:long, op:string, url:string, tags:array<string>, "
        "meta:struct<a:int,b:string>",
        "lsn long, op string, `page url` string, `a:b` int, "
        "`odd``name` string",
        # backquoted names containing top-level-looking delimiters —
        # the splitter must not split/track depth inside quotes
        "lsn long, op string, `a,b` int, `a<b` int, c int",
        # fromDDL accepts ANY whitespace between name and type
        "lsn long, op string, a\nint, b\tint",
    ):
        base["reader"]["eventSchema"] = ddl
        out = dry_run_cluster_cdc_job(base)
        real = [f.name for f in StructType.fromDDL(ddl).fields
                if f.name not in ("op", "lsn")]
        assert out["event_columns"] == real
