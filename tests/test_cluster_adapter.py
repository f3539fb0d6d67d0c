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
