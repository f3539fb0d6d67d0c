"""Stock DataX job.json configs run unchanged (datax_spark/compat.py).

Each test feeds a config in DataX's public job format — the
{"job": {"setting", "content": [{"reader": {"name", "parameter"}}, ...]}}
envelope with the plugin-specific parameter shapes — through
``run_datax_job`` and asserts the data movement actually happened.
The RDBMS plugins execute for real against embedded Derby."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datax_spark.compat import (
    is_datax_job,
    run_datax_job,
    translate_datax_job,
)

DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def test_is_datax_job_detects_envelope():
    dx = {"job": {"content": [{"reader": {"name": "mysqlreader"},
                               "writer": {"name": "hdfswriter"}}]}}
    native = {"reader": {"type": "parquet", "path": "/x"},
              "writer": {"type": "noop"}}
    assert is_datax_job(dx)
    assert not is_datax_job(native)


def test_streamreader_to_streamwriter(spark):
    """DataX's own smoke job: constant generator → print sink."""
    job = {"job": {"content": [{
        "reader": {"name": "streamreader", "parameter": {
            "sliceRecordCount": 7,
            "column": [{"value": "hello", "type": "string", "name": "msg"},
                       {"value": 42, "type": "long", "name": "n"}],
        }},
        "writer": {"name": "streamwriter", "parameter": {"print": True}},
    }]}}
    out = run_datax_job(spark, job)
    rows = out.collect()
    assert len(rows) == 7
    assert rows[0]["msg"] == "hello" and rows[0]["n"] == 42


def test_mysqlreader_shape_to_hdfswriter_orc(spark, tmp_path):
    """The classic DataX job: RDBMS table → columns+where+splitPk →
    HDFS orc. Runs for real on Derby (the jdbcUrl/driver strings are
    the only per-RDBMS difference, exactly DataX's plugin split)."""
    db = f"jdbc:derby:{tmp_path}/db;create=true"
    spark.range(100).selectExpr(
        "id AS pk", "CAST(id % 5 AS INT) AS grp", "CAST(id * 2 AS DOUBLE) AS v"
    ).write.jdbc(db, "src", properties={"driver": DRIVER})
    job = {"job": {
        "setting": {"speed": {"channel": 2},
                    "errorLimit": {"record": 0, "percentage": 0.02}},
        "content": [{
            "reader": {"name": "mysqlreader", "parameter": {
                "column": ["pk", "grp", "v"],
                "where": "pk >= 10",
                "splitPk": "pk",
                "driver": DRIVER,
                "connection": [{"table": ["src"], "jdbcUrl": [db]}],
            }},
            "writer": {"name": "hdfswriter", "parameter": {
                "path": str(tmp_path / "out"),
                "fileType": "orc",
                "writeMode": "truncate",
            }},
        }]}}
    run_datax_job(spark, job)
    back = spark.read.orc(str(tmp_path / "out"))
    assert back.count() == 90
    assert back.agg(F.min("pk")).collect()[0][0] == 10


def test_hdfsreader_positional_to_postgresqlwriter(spark, tmp_path):
    """Headerless delimited text with DataX positional column specs →
    RDBMS writer (insert mode, appends across runs)."""
    src = tmp_path / "in.txt"
    lines = [f"{i}\tname{i}\t{i * 1.5}" for i in range(20)]
    (src).write_text("\n".join(lines))
    db = f"jdbc:derby:{tmp_path}/db2;create=true"
    job = {"job": {"content": [{
        "reader": {"name": "hdfsreader", "parameter": {
            "path": [str(src)],
            "fileType": "text",
            "fieldDelimiter": "\t",
            "column": [
                {"index": 0, "type": "long", "name": "id"},
                {"index": 2, "type": "double", "name": "score"},
            ],
        }},
        "writer": {"name": "postgresqlwriter", "parameter": {
            "writeMode": "insert",
            "driver": DRIVER,
            "connection": [{"table": ["sink"], "jdbcUrl": [db]}],
        }},
    }]}}
    run_datax_job(spark, job)
    run_datax_job(spark, job)  # insert = append
    back = spark.read.jdbc(db, "sink", properties={"driver": DRIVER})
    assert back.count() == 40
    dtypes = {k.lower(): v for k, v in back.dtypes}  # Derby case-folds
    assert dtypes["id"] in ("bigint", "long")


def test_querysql_and_streamwriter(spark, tmp_path):
    """connection.querySql pushes the full statement to the database."""
    db = f"jdbc:derby:{tmp_path}/db3;create=true"
    spark.range(30).selectExpr("id", "CAST(id % 3 AS INT) AS g").write.jdbc(
        db, "t", properties={"driver": DRIVER}
    )
    job = {"job": {"content": [{
        "reader": {"name": "oraclereader", "parameter": {
            "driver": DRIVER,
            "connection": [{
                "querySql": ['SELECT "g", COUNT(*) AS c FROM t GROUP BY "g"'],
                "jdbcUrl": [db],
            }],
        }},
        "writer": {"name": "streamwriter", "parameter": {}},
    }]}}
    out = run_datax_job(spark, job)
    assert sorted(r["C"] for r in out.collect()) == [10, 10, 10]


def test_otswriter_keyed_put_merges(spark, tmp_path):
    """OTS/HBase keyed put (S8/S9): two batch puts of overlapping keys
    land as two exactly-once MERGE epochs; the later batch wins."""
    from datax_spark.icetable.table import IceTable

    root = tmp_path / "ots"
    src1, src2 = tmp_path / "b1.parquet", tmp_path / "b2.parquet"
    spark.createDataFrame(
        [("k1", "v1"), ("k2", "v2")], "rowkey string, val string"
    ).write.parquet(str(src1))
    spark.createDataFrame(
        [("k2", "v2-new"), ("k3", "v3")], "rowkey string, val string"
    ).write.parquet(str(src2))

    def job(path):
        return {"job": {"content": [{
            "reader": {"name": "hdfsreader", "parameter": {
                "path": [str(path)], "fileType": "parquet"}},
            "writer": {"name": "otswriter", "parameter": {
                "table": "pages", "path": str(root),
                "primaryKey": [{"name": "rowkey", "type": "string"}],
                "column": [{"name": "val", "type": "string"}],
            }},
        }]}}

    run_datax_job(spark, job(src1))
    run_datax_job(spark, job(src2))
    state = {r["rowkey"]: r["val"]
             for r in IceTable.load(spark, root).read().collect()}
    assert state == {"k1": "v1", "k2": "v2-new", "k3": "v3"}


def test_translate_rejects_unknown_plugin():
    job = {"job": {"content": [{
        "reader": {"name": "mongodbreader", "parameter": {}},
        "writer": {"name": "streamwriter", "parameter": {}},
    }]}}
    with pytest.raises(ValueError, match="unknown DataX reader"):
        translate_datax_job(job)


def test_hdfsreader_skipheader_positional(spark, tmp_path):
    """skipHeader=true + positional column specs: the header row is
    skipped and positional indexes still resolve (by position, not by
    the _c{i} names that the header consumed)."""
    src = tmp_path / "in2.txt"
    src.write_text("id,name,score\n" + "\n".join(
        f"{i},n{i},{i * 2.0}" for i in range(10)))
    job = {"job": {"content": [{
        "reader": {"name": "txtfilereader", "parameter": {
            "path": [str(src)], "fileType": "text", "skipHeader": True,
            "column": [{"index": 0, "type": "long"},
                       {"index": 2, "type": "double", "name": "sc"}],
        }},
        "writer": {"name": "streamwriter", "parameter": {}},
    }]}}
    out = run_datax_job(spark, job)
    rows = sorted((r["col0"], r["sc"]) for r in out.collect())
    assert rows[0] == (0, 0.0) and rows[-1] == (9, 18.0)


def test_odpswriter_static_partition_truncate_replaces_one_partition(spark, tmp_path):
    """ODPS/Hive tunnel semantics: a static partition spec adds the
    constant column, and truncate replaces ONLY that partition."""
    srcA, srcB = tmp_path / "a.parquet", tmp_path / "b.parquet"
    spark.range(5).selectExpr("id", "CAST(id AS DOUBLE) AS v").write.parquet(str(srcA))
    spark.range(3).selectExpr("id + 100 AS id", "CAST(id AS DOUBLE) AS v").write.parquet(str(srcB))

    def job(src, pt, truncate):
        return {"job": {"content": [{
            "reader": {"name": "hdfsreader", "parameter": {
                "path": [str(src)], "fileType": "parquet"}},
            "writer": {"name": "odpswriter", "parameter": {
                "table": "ods_pages", "partition": f"pt={pt}",
                "truncate": truncate}},
        }]}}

    spark.sql("DROP TABLE IF EXISTS ods_pages")
    run_datax_job(spark, job(srcA, "20230101", True))
    run_datax_job(spark, job(srcB, "20230102", True))
    counts = {r["pt"]: r["n"] for r in spark.sql(
        "SELECT pt, count(*) AS n FROM ods_pages GROUP BY pt").collect()}
    assert counts == {"20230101": 5, "20230102": 3}

    # truncate-reload partition 1: partition 2 must survive
    run_datax_job(spark, job(srcB, "20230101", True))
    counts = {r["pt"]: r["n"] for r in spark.sql(
        "SELECT pt, count(*) AS n FROM ods_pages GROUP BY pt").collect()}
    assert counts == {"20230101": 3, "20230102": 3}
    spark.sql("DROP TABLE IF EXISTS ods_pages")


def test_stock_transformer_chain(spark, tmp_path):
    """DataX transformer section runs unchanged: positional dx_substr /
    dx_pad / dx_replace / dx_filter with 0-based offsets and
    drop-on-match filter semantics (like = full-string Java regex)."""
    src = tmp_path / "tf_src"
    spark.createDataFrame(
        [("alpha-one", "x1", "keep", 5),
         ("beta-two", "x2", "dropme", 50),
         ("gamma-three", "x3", "keep", 7)],
        "a string, b string, c string, n long",
    ).coalesce(1).write.parquet(str(src))
    job = {"job": {"content": [{
        "reader": {"name": "hdfsreader", "parameter": {
            "path": str(src), "fileType": "parquet"}},
        "transformer": [
            # substr col 0 from 0-based index 0, length 5 -> "alpha"…
            {"name": "dx_substr", "parameter": {
                "columnIndex": 0, "paras": ["0", "5"]}},
            # pad col 1 left to 4 with '*'
            {"name": "dx_pad", "parameter": {
                "columnIndex": 1, "paras": ["l", "4", "*"]}},
            # replace 4 chars at 0-based index 0 of col 2 with 'T'
            {"name": "dx_replace", "parameter": {
                "columnIndex": 2, "paras": ["0", "4", "T"]}},
            # drop records where n > 10
            {"name": "dx_filter", "parameter": {
                "columnIndex": 3, "paras": [">", "10"]}},
            # drop records whose (replaced) col 2 full-matches 'Tme'
            {"name": "dx_filter", "parameter": {
                "columnIndex": 2, "paras": ["like", "Tme"]}},
        ],
        "writer": {"name": "streamwriter", "parameter": {}},
    }]}}
    out = run_datax_job(spark, job)
    rows = {r["a"]: r for r in out.collect()}
    # beta-two dropped by n>10 (n=50); its replaced c would be 'Tme' too
    assert set(rows) == {"alpha", "gamma"}
    assert rows["alpha"]["b"] == "**x1"
    assert rows["alpha"]["c"] == "T"          # 'keep' -> replace(0,4,'T')
    assert rows["gamma"]["n"] == 7


def test_stock_dx_groovy_rejected():
    job = {"job": {"content": [{
        "reader": {"name": "streamreader", "parameter": {
            "sliceRecordCount": 1,
            "column": [{"value": "x", "type": "string", "name": "a"}]}},
        "transformer": [{"name": "dx_groovy", "parameter": {
            "code": "record.setColumn(0, null)"}}],
        "writer": {"name": "streamwriter", "parameter": {}},
    }]}}
    import pytest as _pt

    from datax_spark.compat import translate_datax_job

    with _pt.raises(ValueError, match="dx_groovy"):
        translate_datax_job(job)


def test_dx_filter_compares_in_column_type(spark):
    """String column '007' must NOT equal 7 numerically; numeric column
    7 must equal '7'. (DataX compares in the column's type.)"""
    job = {"job": {"content": [{
        "reader": {"name": "streamreader", "parameter": {
            "sliceRecordCount": 1,
            "column": [{"value": "007", "type": "string", "name": "s"},
                       {"value": 7, "type": "long", "name": "n"}]}},
        "transformer": [
            {"name": "dx_filter", "parameter": {
                "columnIndex": 0, "paras": ["=", "7"]}},
        ],
        "writer": {"name": "streamwriter", "parameter": {}},
    }]}}
    out = run_datax_job(spark, job)
    assert out.count() == 1  # '007' != '7' as strings — record kept

    job["job"]["content"][0]["transformer"] = [
        {"name": "dx_filter", "parameter": {
            "columnIndex": 1, "paras": ["=", "7"]}},
    ]
    out = run_datax_job(spark, job)
    assert out.count() == 0  # numeric 7 == '7' — record dropped
