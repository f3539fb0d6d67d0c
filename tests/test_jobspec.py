"""Job-spec compiler + transformer tests (jobspec.py, functions/transformers.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datax_spark.functions import transformers as TX
from datax_spark.jobspec import run_batch_job, run_cdc_job


def test_transformers_basic(spark):
    df = spark.createDataFrame([("abcdef", "7"), (None, "x")], "s string, n string")
    out = df.select(
        TX.dx_substr("s", 2, 3).alias("sub"),
        TX.dx_pad("s", "l", 8, "_").alias("pad"),
        TX.dx_replace("s", 2, 3, "XY").alias("rep"),
    ).collect()
    assert out[0]["sub"] == "bcd"
    assert out[0]["pad"] == "__abcdef"
    assert out[0]["rep"] == "aXYef"  # chars 2-4 replaced with XY
    assert out[1]["sub"] is None and out[1]["pad"] is None and out[1]["rep"] is None


def test_strict_cast_flags_failures(spark):
    df = spark.createDataFrame([("7",), ("x",), (None,)], "n string")
    casted, ok = TX.strict_cast("n", "long")
    rows = df.select(casted.alias("v"), ok.alias("ok")).collect()
    assert [r["v"] for r in rows] == [7, None, None]
    assert [r["ok"] for r in rows] == [True, False, True]  # null input is ok


def test_dx_filter_drops_matches(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "x long")
    assert {r["x"] for r in TX.dx_filter(df, "x = 2").collect()} == {1, 3}


def test_batch_job_end_to_end(spark, sf_dir, tmp_path):
    spec = {
        "reader": {
            "type": "parquet",
            "path": f"{sf_dir}/documents.parquet",
            "column": ["doc_id", "lang", "n_chars", {"value": "b7", "name": "tag"}],
            "where": "lang = 'en'",
        },
        "transforms": [
            {"op": "pad", "col": "lang", "side": "r", "len": 4, "pad": "*"},
            {"op": "filter", "predicate": "n_chars < 50"},
            {"op": "cast", "col": "n_chars", "to": "double"},
        ],
        "writer": {"type": "parquet", "path": str(tmp_path / "out"), "mode": "overwrite"},
    }
    out = run_batch_job(spark, spec)
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.count() == out.count() > 0
    row = back.first()
    assert row["lang"] == "en**" and row["tag"] == "b7"
    assert dict(back.dtypes)["n_chars"] == "double"
    assert back.filter(F.col("n_chars") < 50).count() == 0


def test_cdc_job_from_spec(spark, tmp_path):
    from pyspark.sql import types as T

    from datax_spark.datagen.generator import EventLogSpec, generate_event_log

    generate_event_log(
        tmp_path / "events",
        EventLogSpec(n_events=300, n_urls=60, n_domains=6, n_epochs=2, seed=5),
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
    spec = {
        "reader": {"type": "change_tail", "path": str(tmp_path / "events")},
        "writer": {
            "type": "icetable",
            "path": str(tmp_path / "table"),
            "schema": schema,
            "numPartitions": 4,
        },
        "settings": {"errorLimit": {"percentage": 0.5}},
        "checkpoint": str(tmp_path / "ckpt"),
    }
    driver = run_cdc_job(spark, spec)
    assert driver.table.read().count() > 0
    # a second invocation resumes and is a no-op on an exhausted tail
    driver2 = run_cdc_job(spark, spec)
    assert driver2.table.current_version() == driver.table.current_version()


def test_vectorized_escape_hatch(spark):
    fn = TX.dx_vectorized(lambda s: s.str.upper())
    df = spark.createDataFrame([("ab",), ("cd",)], "s string")
    assert {r[0] for r in df.select(fn(F.col("s"))).collect()} == {"AB", "CD"}


def test_batch_job_error_budget_counts_cast_failures(spark, tmp_path):
    """strict_cast failures are DIRTY rows, not silent nulls: they count
    against settings.errorLimit, are excluded from the main output, and
    land in writer.quarantinePath (DataX dirty-record semantics)."""
    src = tmp_path / "in"
    spark.createDataFrame(
        [("a", "1"), ("b", "2"), ("c", "oops"), ("d", None)], "k string, n string"
    ).write.parquet(str(src))
    spec = {
        "reader": {"type": "parquet", "path": str(src)},
        "transforms": [{"op": "cast", "col": "n", "to": "long"}],
        "writer": {
            "type": "parquet",
            "path": str(tmp_path / "out"),
            "mode": "overwrite",
            "quarantinePath": str(tmp_path / "quar"),
        },
        "settings": {"errorLimit": {"percentage": 0.5}},
    }
    out = run_batch_job(spark, spec)
    main = spark.read.parquet(str(tmp_path / "out"))
    assert {r["k"] for r in main.collect()} == {"a", "b", "d"}  # null input is ok
    assert "_cast_ok" not in main.columns
    quar = spark.read.parquet(str(tmp_path / "quar"))
    assert {r["k"] for r in quar.collect()} == {"c"}

    # a tight budget aborts the job instead of shipping dirty rows
    from datax_spark.operators.quarantine import ErrorBudgetExceeded

    spec["settings"]["errorLimit"] = {"record": 0}
    with pytest.raises(ErrorBudgetExceeded):
        run_batch_job(spark, spec)


def test_csv_reader_writer_roundtrip(spark, tmp_path):
    src = spark.createDataFrame(
        [("a", 1, 2.5), ("b", 2, 3.5)], "k string, n long, x double"
    )
    spec_w = {
        "reader": {"type": "parquet", "path": str(tmp_path / "p")},
        "writer": {"type": "csv", "path": str(tmp_path / "c"), "mode": "overwrite",
                   "delimiter": "|"},
    }
    src.write.parquet(str(tmp_path / "p"))
    run_batch_job(spark, spec_w)
    spec_r = {
        "reader": {"type": "csv", "path": str(tmp_path / "c"), "delimiter": "|",
                   "schema": "k string, n long, x double"},
    }
    back = run_batch_job(spark, spec_r)
    assert sorted((r["k"], r["n"], r["x"]) for r in back.collect()) == [
        ("a", 1, 2.5), ("b", 2, 3.5)
    ]


def test_orc_and_json_and_text_readers(spark, tmp_path):
    src = spark.createDataFrame([("x", 7), ("y", 8)], "k string, n long")
    src.write.parquet(str(tmp_path / "p"))
    run_batch_job(spark, {
        "reader": {"type": "parquet", "path": str(tmp_path / "p")},
        "writer": {"type": "orc", "path": str(tmp_path / "o"), "mode": "overwrite"},
    })
    orc = run_batch_job(spark, {"reader": {"type": "orc", "path": str(tmp_path / "o")}})
    assert {(r["k"], r["n"]) for r in orc.collect()} == {("x", 7), ("y", 8)}

    run_batch_job(spark, {
        "reader": {"type": "orc", "path": str(tmp_path / "o")},
        "writer": {"type": "json", "path": str(tmp_path / "j"), "mode": "overwrite"},
    })
    js = run_batch_job(spark, {"reader": {"type": "json", "path": str(tmp_path / "j")}})
    assert {(r["k"], r["n"]) for r in js.collect()} == {("x", 7), ("y", 8)}

    (tmp_path / "t").mkdir()
    (tmp_path / "t" / "a.txt").write_text("line one\nline two\n")
    txt = run_batch_job(spark, {"reader": {"type": "text", "path": str(tmp_path / "t")}})
    assert {r["value"] for r in txt.collect()} == {"line one", "line two"}


def test_jdbc_reader_compiles_splitpk_plan():
    """DataX RDBMS reader (S1-S4) compiles to the exact spark.read.jdbc
    call — splitPk becomes partitionColumn range parallelism. Execution
    needs a live database (absent in this sandbox); the plan is the
    offline-testable contract."""
    from datax_spark.jobspec import compile_jdbc_reader

    plan = compile_jdbc_reader({
        "type": "jdbc",
        "connection": {"jdbcUrl": "jdbc:mysql://db:3306/crawl", "table": "pages"},
        "username": "u", "password": "p", "fetchSize": 5000,
        "splitPk": "id", "splitLowerBound": 0, "splitUpperBound": 1000000,
        "numPartitions": 16,
    })
    assert plan.url == "jdbc:mysql://db:3306/crawl"
    assert plan.table == "pages"
    assert plan.partition_column == "id"
    assert (plan.lower_bound, plan.upper_bound, plan.num_partitions) == (0, 1000000, 16)
    assert plan.properties == {"user": "u", "password": "p", "fetchsize": "5000"}

    qplan = compile_jdbc_reader({
        "type": "jdbc", "jdbcUrl": "jdbc:postgresql://db/x",
        "querySql": "SELECT url, lsn FROM wal WHERE lsn > 100",
    })
    assert qplan.table == "(SELECT url, lsn FROM wal WHERE lsn > 100) dx_query"
    assert qplan.partition_column is None


def test_pre_and_post_sql_hooks(spark, tmp_path):
    """DataX prepare()/post() lifecycle: preSql runs before the read is
    compiled (here it creates the staging view the reader consumes),
    postSql after a successful write."""
    src = tmp_path / "in"
    spark.createDataFrame([("a", 1), ("b", 2)], "k string, n long").write.parquet(str(src))
    spec = {
        "reader": {"querySql": "SELECT k, n * 10 AS n FROM dx_stage"},
        "writer": {
            "type": "parquet",
            "path": str(tmp_path / "out"),
            "mode": "overwrite",
            "preSql": [
                f"CREATE OR REPLACE TEMP VIEW dx_stage AS "
                f"SELECT * FROM parquet.`{src}` WHERE n > 1"
            ],
            "postSql": [
                "CREATE OR REPLACE TEMP VIEW dx_done AS SELECT 1 AS ok"
            ],
        },
    }
    run_batch_job(spark, spec)
    back = spark.read.parquet(str(tmp_path / "out"))
    assert [(r["k"], r["n"]) for r in back.collect()] == [("b", 20)]
    assert spark.sql("SELECT ok FROM dx_done").collect()[0]["ok"] == 1
    spark.catalog.dropTempView("dx_stage")
    spark.catalog.dropTempView("dx_done")


def test_table_writer_partitioned_catalog(spark, tmp_path):
    """S6 (Hive table): partitioned saveAsTable via the job spec; the
    catalog table reads back through the `table` reader and scans prune
    on the partition column."""
    src = tmp_path / "in"
    spark.createDataFrame(
        [("en", 1), ("en", 2), ("de", 3)], "lang string, n long"
    ).write.parquet(str(src))
    spec = {
        "reader": {"type": "parquet", "path": str(src)},
        "writer": {
            "type": "table",
            "table": "dx_pages_t",
            "path": str(tmp_path / "tbl"),
            "partitionBy": ["lang"],
            "mode": "overwrite",
        },
    }
    try:
        run_batch_job(spark, spec)
        back = run_batch_job(
            spark, {"reader": {"type": "table", "table": "dx_pages_t",
                               "where": "lang = 'en'"}}
        )
        assert sorted(r["n"] for r in back.collect()) == [1, 2]
        # physical layout is partitioned by lang (pruning-capable)
        assert (tmp_path / "tbl" / "lang=en").exists()
        assert (tmp_path / "tbl" / "lang=de").exists()
    finally:
        spark.sql("DROP TABLE IF EXISTS dx_pages_t")


def test_curation_pipeline_job_spec(spark, sf_dir, tmp_path):
    """A full training-data prep pipeline as ONE job spec: curate ->
    deterministic sample -> token-budget mix -> parquet writer — every
    corpus operator reachable from the CLI path."""
    from datax_spark.jobspec import run_batch_job

    spec = {
        "reader": {"type": "parquet", "path": f"{sf_dir}/documents.parquet"},
        "transforms": [
            {"op": "curate", "minQuality": 0.8, "langs": ["en"]},
            {"op": "sample", "fraction": 0.9},
            {"op": "tokenBudget", "budgetTokens": 500},
        ],
        "writer": {"type": "parquet", "path": str(tmp_path / "out"), "mode": "overwrite"},
    }
    df = run_batch_job(spark, spec)
    rows = df.collect()
    assert len(rows) > 0
    assert {"doc_id", "source", "lang_det", "quality", "n_tokens", "cum_tokens"} <= set(
        df.columns
    )
    # budget honored: a row starts below the budget
    assert all(r["cum_tokens"] - r["n_tokens"] < 500 for r in rows)
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.count() == len(rows)


def test_line_dedup_and_canonicalize_transforms(spark, tmp_path):
    from datax_spark.jobspec import run_batch_job

    src = tmp_path / "docs"
    spark.createDataFrame(
        [(0, "x\ny"), (1, "y\nz"), (2, "HTTPS://WWW.A.com/p?utm_source=1")],
        "doc_id long, text string",
    ).write.parquet(str(src))
    out = run_batch_job(
        spark,
        {
            "reader": {"type": "parquet", "path": str(src)},
            "transforms": [{"op": "lineDedup"}],
        },
    )
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert got[0] == "x\ny" and got[1] == "z"
    out2 = run_batch_job(
        spark,
        {
            "reader": {"type": "parquet", "path": str(src)},
            "transforms": [{"op": "canonicalizeUrl", "col": "text", "as": "canon"}],
        },
    )
    canon = {r["doc_id"]: r["canon"] for r in out2.collect()}
    assert canon[2] == "https://a.com/p"


def test_chunk_and_redact_transforms(spark, tmp_path):
    from datax_spark.jobspec import run_batch_job

    src = tmp_path / "docs"
    spark.createDataFrame(
        [(0, "w0 w1 w2 w3 w4 w5 w6 w7 mail a@b.io")],
        "doc_id long, text string",
    ).write.parquet(str(src))
    out = run_batch_job(
        spark,
        {
            "reader": {"type": "parquet", "path": str(src)},
            "transforms": [
                {"op": "redactPii"},
                {"op": "chunk", "chunkTokens": 4, "overlap": 1},
            ],
        },
    )
    rows = sorted(out.collect(), key=lambda r: r["chunk_idx"])
    assert rows[0]["chunk_text"] == "w0 w1 w2 w3"
    assert all("<EMAIL>" in r["chunk_text"] or "a@b.io" not in r["chunk_text"] for r in rows)


def test_gopher_filter_and_decontaminate_transforms(spark, tmp_path):
    from datax_spark.jobspec import run_batch_job

    src = tmp_path / "docs"
    spark.createDataFrame(
        [
            (0, "the black cat sat on the warm mat and it is truly a fine day in the sun today"),
            (1, "- a\n- b\n- c"),  # all bullets + too short: gopher-fails
            (2, "the dog ran over the hill and it was a good day for the dog"),
        ],
        "doc_id long, text string",
    ).write.parquet(str(src))
    bench = tmp_path / "bench"
    spark.createDataFrame(
        [(100, "ran over the hill")], "doc_id long, text string"
    ).write.parquet(str(bench))

    out = run_batch_job(
        spark,
        {
            "reader": {"type": "parquet", "path": str(src)},
            "transforms": [
                {"op": "gopherFilter"},
                {"op": "decontaminate", "benchmark": {"type": "parquet", "path": str(bench)}},
            ],
        },
    )
    # 1 fails gopher; 2 overlaps the benchmark 3-grams; 0 survives
    assert [r["doc_id"] for r in out.collect()] == [0]

    # threshold override: demand 10+ stopwords -> nothing survives
    out2 = run_batch_job(
        spark,
        {
            "reader": {"type": "parquet", "path": str(src)},
            "transforms": [{"op": "gopherFilter", "minStopwords": 10}],
        },
    )
    assert out2.count() == 0


def test_speed_channel_bounds_parallelism(spark, sf_dir, tmp_path):
    """DataX speed.channel: bounds write fan-out for THIS job, and the
    per-job shuffle conf is restored afterwards (never leaks into the
    next job on the shared session)."""
    from datax_spark.jobspec import run_batch_job

    before = spark.conf.get("spark.sql.shuffle.partitions")
    run_batch_job(
        spark,
        {
            "reader": {"type": "parquet", "path": f"{sf_dir}/documents.parquet"},
            "writer": {"type": "parquet", "path": str(tmp_path / "out"),
                       "mode": "overwrite"},
            "settings": {"speed": {"channel": 2}},
        },
    )
    files = [p for p in (tmp_path / "out").glob("part-*") if p.suffix == ".parquet"]
    assert 0 < len(files) <= 2
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_tokenize_transform(spark, tmp_path):
    from datax_spark.jobspec import run_batch_job

    src = tmp_path / "docs"
    spark.createDataFrame(
        [(0, "the cat and the hat"), (1, "the dog")],
        "doc_id long, text string",
    ).write.parquet(str(src))
    out = run_batch_job(
        spark,
        {
            "reader": {"type": "parquet", "path": str(src)},
            "transforms": [{"op": "tokenize", "vocabSize": 3, "oovBuckets": 4}],
        },
    )
    rows = out.collect()
    assert {r["doc_id"] for r in rows} == {0, 1}
    # 'the'=0 everywhere; OOV ids live in [3, 7)
    the_ids = {r["token_id"] for r in rows if r["is_oov"] == 0}
    assert 0 in the_ids and all(i < 3 for i in the_ids)
    assert all(3 <= r["token_id"] < 7 for r in rows if r["is_oov"] == 1)


def test_stratify_transform(spark, tmp_path):
    from datax_spark.jobspec import run_batch_job

    src = tmp_path / "docs"
    spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", "t") for i in range(400)],
        "doc_id long, source string, text string",
    ).write.parquet(str(src))
    out = run_batch_job(
        spark,
        {
            "reader": {"type": "parquet", "path": str(src)},
            "transforms": [{"op": "stratify", "fractions": {"a": 1.0}}],
        },
    )
    rows = out.collect()
    assert all(r["source"] == "a" for r in rows) and len(rows) == 200


def test_new_corpus_transforms(spark, tmp_path):
    from datax_spark.jobspec import run_batch_job

    src = tmp_path / "docs_new"
    rows = [(i, "café" if i % 2 else "plain text", float(i % 10)) for i in range(100)]
    rows.append((999, "outlier", 1e6))
    spark.createDataFrame(rows, "doc_id long, text string, v double").write.parquet(
        str(src)
    )
    out = run_batch_job(
        spark,
        {
            "reader": {"type": "parquet", "path": str(src)},
            "transforms": [
                {"op": "normalizeUnicode", "col": "text", "casefold": True},
                {"op": "dropOutliers", "col": "v"},
                {"op": "shard", "keyCol": "doc_id", "nShards": 4},
                {
                    "op": "expect",
                    "constraints": [
                        {"kind": "not_null", "col": "text"},
                        {"kind": "min_rows", "rows": 50},
                    ],
                },
            ],
        },
    )
    rows = out.collect()
    assert len(rows) == 100                     # the 1e6 outlier dropped
    assert {r["shard"] for r in rows} <= {0, 1, 2, 3}
    assert all("café" == r["text"] or r["text"] == "plain text" for r in rows)


def test_expect_transform_aborts_on_violation(spark, tmp_path):
    import pytest as _pytest

    from datax_spark.jobspec import run_batch_job

    src = tmp_path / "docs_bad"
    spark.createDataFrame(
        [(1, None), (2, "x")], "doc_id long, text string"
    ).write.parquet(str(src))
    with _pytest.raises(ValueError, match="not_null"):
        run_batch_job(
            spark,
            {
                "reader": {"type": "parquet", "path": str(src)},
                "transforms": [
                    {"op": "expect",
                     "constraints": [{"kind": "not_null", "col": "text"}]},
                ],
            },
        )


def test_zorder_transform_layout(spark, tmp_path):
    from datax_spark.jobspec import run_batch_job

    src = tmp_path / "docs_z"
    spark.createDataFrame(
        [(i, i % 16, (i * 7) % 16) for i in range(256)],
        "doc_id long, x long, y long",
    ).write.parquet(str(src))
    out = run_batch_job(
        spark,
        {
            "reader": {"type": "parquet", "path": str(src)},
            "transforms": [
                {"op": "zorder", "cols": ["x", "y"], "bits": 4,
                 "numPartitions": 4},
            ],
        },
    )
    assert out.rdd.getNumPartitions() == 4
    assert out.count() == 256


def test_icetable_reader_filters_stats_pruned(spark, tmp_path):
    """reader.filters takes the stats-pruned scan path: result equals
    the exact filter, and the filter alone prunes files (checked via
    plan_scan on the same table)."""
    from pyspark.sql import types as T

    from datax_spark.icetable.table import IceTable
    from datax_spark.operators.merge import apply_epoch

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("val", T.LongType()),
        ]
    )
    t = IceTable.create(spark, tmp_path / "t", schema, num_partitions=2)
    ev = spark.createDataFrame(
        [(i + 1, "I", f"u{i}", i) for i in range(20)],
        "lsn long, op string, url string, val long",
    )
    apply_epoch(t, ev, 0, extract=False)
    ev2 = spark.createDataFrame(
        [(100 + i, "I", f"w{i}", 1000 + i) for i in range(20)],
        "lsn long, op string, url string, val long",
    )
    apply_epoch(t, ev2, 1, merge_strategy="mor", extract=False)

    out = run_batch_job(
        spark,
        {
            "reader": {
                "type": "icetable",
                "path": str(tmp_path / "t"),
                "filters": [["val", ">=", 1000]],
            },
        },
    )
    assert {r["url"] for r in out.collect()} == {f"w{i}" for i in range(20)}
    kept, total = t.plan_scan([("val", ">=", 1000)])
    assert len(kept) < total


def test_icetable_merge_into_writer(spark, tmp_path):
    """writer.type icetable_merge_into: clause-driven upsert from a
    plain batch (no op/lsn), idempotent under writer.epoch retry."""
    from datax_spark.icetable.table import IceTable

    src = tmp_path / "src.parquet"
    spark.createDataFrame(
        [("a", 10), ("b", 20)], "url string, val long"
    ).write.parquet(str(src))

    spec = {
        "reader": {"type": "parquet", "path": str(src)},
        "writer": {
            "type": "icetable_merge_into",
            "path": str(tmp_path / "t"),
            "whenMatchedUpdate": "*",
            "epoch": 7,
        },
    }
    run_batch_job(spark, spec)  # auto-creates; all rows insert
    t = IceTable.load(spark, tmp_path / "t")
    assert {r["url"]: r["val"] for r in t.read().collect()} == {"a": 10, "b": 20}

    # second batch: conditional update + gated insert
    src2 = tmp_path / "src2.parquet"
    spark.createDataFrame(
        [("a", 99), ("b", 1), ("c", 5)], "url string, val long"
    ).write.parquet(str(src2))
    spec2 = {
        "reader": {"type": "parquet", "path": str(src2)},
        "writer": {
            "type": "icetable_merge_into",
            "path": str(tmp_path / "t"),
            "whenMatchedUpdate": {"val": "source.val"},
            "whenMatchedUpdateCondition": "source.val > target.val",
            "whenNotMatchedInsertCondition": "source.val > 1",
            "epoch": 8,
        },
    }
    run_batch_job(spark, spec2)
    assert {r["url"]: r["val"] for r in t.read().collect()} == {
        "a": 99,
        "b": 20,
        "c": 5,
    }
    # replay: ledger no-op
    run_batch_job(spark, spec2)
    assert {r["url"]: r["val"] for r in t.read().collect()} == {
        "a": 99,
        "b": 20,
        "c": 5,
    }


def test_bm25_index_writer_builds_then_syncs(spark, tmp_path):
    """writer.type bm25_index is the index-maintenance consumer as a
    re-runnable DataX-style job: first run builds from the table state
    and records a version cursor, the re-run consumes only the
    changelog, and the probe equals a one-shot rebuild on the final
    state. A cursor already current makes the re-run a no-op."""
    from pyspark.sql import types as T

    from datax_spark.icetable.table import IceTable
    from datax_spark.operators.merge import apply_epoch
    from datax_spark.operators.text_index import Bm25Index

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    t = IceTable.create(
        spark, tmp_path / "t", schema, num_partitions=2, key_column="url"
    )
    t.bulk_overwrite(
        spark.createDataFrame(
            [("u0", 0, "quick brown fox"), ("u1", 1, "lazy dog naps"),
             ("u2", 2, "spark shuffles data")],
            schema,
        ),
        epoch=0,
    )
    spec = {
        "reader": {"type": "icetable", "path": str(tmp_path / "t")},
        "writer": {"type": "bm25_index", "path": str(tmp_path / "idx"),
                   "numBuckets": 8, "idColumn": "doc_id"},
    }
    out = run_batch_job(spark, spec).collect()[0]
    assert out["action"] == "build" and out["added"] == 3

    apply_epoch(
        t,
        spark.createDataFrame(
            [("u1", 1, None, "D", 10),
             ("u3", 3, "a quick spark dog", "I", 11)],
            "url string, doc_id long, text string, op string, lsn long",
        ),
        epoch=1,
        extract=False,
    )
    out = run_batch_job(spark, spec).collect()[0]
    assert out["action"] == "sync" and out["removed"] == 1 and out["added"] == 1

    q = spark.createDataFrame(
        [(0, "quick spark")], "query_id long, query string"
    )
    want = Bm25Index.build(
        t.read().select("doc_id", "text"), tmp_path / "want", n_buckets=8
    )
    got = Bm25Index(spark, tmp_path / "idx")
    assert sorted(map(tuple, got.probe(q, k=3).collect())) == sorted(
        map(tuple, want.probe(q, k=3).collect())
    )

    # cursor current: no-op
    out = run_batch_job(spark, spec).collect()[0]
    assert out["action"] == "sync" and out["removed"] == 0 and out["added"] == 0

    with pytest.raises(ValueError, match="transforms"):
        run_batch_job(spark, {**spec, "transforms": [{"type": "dx_filter"}]})


def test_trigram_and_ivf_index_writers(spark, tmp_path):
    """The other two maintained artifacts share the job surface:
    build on first run, changelog-sync on re-run."""
    from pyspark.sql import types as T

    from datax_spark.icetable.table import IceTable
    from datax_spark.operators.ann_index import IvfIndex
    from datax_spark.operators.merge import apply_epoch
    from datax_spark.operators.trigram_index import TrigramIndex

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    t = IceTable.create(
        spark, tmp_path / "t", schema, num_partitions=2, key_column="url"
    )
    t.bulk_overwrite(
        spark.createDataFrame(
            [
                ("u0", 0, "merge batch alpha", [1.0, 0.0]),
                ("u1", 1, "nothing here", [0.0, 1.0]),
                ("u2", 2, "merge batch beta", [1.0, 1.0]),
            ],
            schema,
        ),
        epoch=0,
    )
    tg_spec = {
        "reader": {"type": "icetable", "path": str(tmp_path / "t")},
        "writer": {"type": "trigram_index", "path": str(tmp_path / "tg"),
                   "numBuckets": 8},
    }
    ivf_spec = {
        "reader": {"type": "icetable", "path": str(tmp_path / "t")},
        "writer": {"type": "ivf_index", "path": str(tmp_path / "ivf"),
                   "numCells": 2, "idColumn": "doc_id"},
    }
    assert run_batch_job(spark, tg_spec).collect()[0]["action"] == "build"
    assert run_batch_job(spark, ivf_spec).collect()[0]["action"] == "build"

    apply_epoch(
        t,
        spark.createDataFrame(
            [("u1", 1, "a merge batch too", [0.5, -1.0], "U", 10)],
            "url string, doc_id long, text string, "
            "embedding array<double>, op string, lsn long",
        ),
        epoch=1,
        extract=False,
    )
    out = run_batch_job(spark, tg_spec).collect()[0]
    assert out["action"] == "sync" and out["removed"] == 1 and out["added"] == 1
    out = run_batch_job(spark, ivf_spec).collect()[0]
    assert out["action"] == "sync" and out["removed"] == 1 and out["added"] == 1

    docs = t.read().select("doc_id", "text")
    got = TrigramIndex(spark, tmp_path / "tg").search(docs, "merge batch")
    assert sorted(r["doc_id"] for r in got.collect()) == [0, 1, 2]
    assert IvfIndex(spark, tmp_path / "ivf").meta["rows"] == 3


def test_icetable_join_view_writer(spark, tmp_path):
    """The maintained join view as a re-runnable job: create+bootstrap
    on first run, changelog-advance on re-run, no-op when current."""
    from pyspark.sql import types as T

    from datax_spark.icetable.table import IceTable
    from datax_spark.operators.merge import apply_epoch

    a_schema = T.StructType(
        [T.StructField("url", T.StringType()), T.StructField("val", T.LongType())]
    )
    b_schema = T.StructType(
        [T.StructField("url", T.StringType()), T.StructField("meta", T.StringType())]
    )
    a = IceTable.create(spark, tmp_path / "a", a_schema, num_partitions=2,
                        key_column="url")
    a.bulk_overwrite(
        spark.createDataFrame([("k1", 1), ("k2", 2)], a_schema), epoch=0
    )
    b = IceTable.create(spark, tmp_path / "b", b_schema, num_partitions=2,
                        key_column="url")
    b.bulk_overwrite(
        spark.createDataFrame([("k2", "m2"), ("k3", "m3")], b_schema), epoch=0
    )
    spec = {
        "writer": {"type": "icetable_join_view", "path": str(tmp_path / "v"),
                   "pathA": str(tmp_path / "a"), "pathB": str(tmp_path / "b"),
                   "numPartitions": 2},
    }
    out = run_batch_job(spark, spec).collect()[0]
    assert out["epoch"] == 0
    v = IceTable.load(spark, tmp_path / "v")
    assert {(r["url"], r["val"], r["meta"]) for r in v.read().collect()} == {
        ("k2", 2, "m2")
    }

    apply_epoch(
        a,
        spark.createDataFrame(
            [("k3", 3, "I", 10)], "url string, val long, op string, lsn long"
        ),
        epoch=1,
        extract=False,
    )
    out = run_batch_job(spark, spec).collect()[0]
    assert out["epoch"] == 1
    v = IceTable.load(spark, tmp_path / "v")
    assert {(r["url"], r["val"], r["meta"]) for r in v.read().collect()} == {
        ("k2", 2, "m2"),
        ("k3", 3, "m3"),
    }
    # current: no epoch
    assert run_batch_job(spark, spec).collect()[0]["epoch"] is None


def test_file_writer_partitioning_and_options(spark, tmp_path):
    """hdfswriter-style knobs on the file writers: hive-style partition
    dirs, compression, per-file record caps, csv nullFormat."""
    df = spark.range(20).selectExpr(
        "id", "CAST(id % 2 AS STRING) AS part",
        "CASE WHEN id % 5 = 0 THEN NULL ELSE CONCAT('v', id) END AS val",
    )
    from datax_spark.jobspec import _write_batch_output

    _write_batch_output(
        spark, df,
        {"type": "parquet", "path": str(tmp_path / "p"),
         "mode": "overwrite", "partitionBy": ["part"],
         "compress": "zstd", "maxRecordsPerFile": 4},
    )
    import glob

    assert (tmp_path / "p" / "part=0").exists()
    assert (tmp_path / "p" / "part=1").exists()
    files = glob.glob(str(tmp_path / "p" / "part=*/*.zstd.parquet"))
    assert files, "zstd parquet files expected"
    back = spark.read.parquet(str(tmp_path / "p"))
    assert back.count() == 20 and set(back.columns) == {"id", "part", "val"}

    _write_batch_output(
        spark, df.drop("part"),
        {"type": "csv", "path": str(tmp_path / "c"), "mode": "overwrite",
         "nullFormat": "\\\\N", "header": False},
    )
    text = "".join(
        open(f).read() for f in glob.glob(str(tmp_path / "c" / "*.csv"))
    )
    assert "\\\\N" in text  # NULLs rendered as the DataX nullFormat
