"""Job-spec compiler: DataX's JSON job config model → a DataFrame program.

DataX drives every sync from one JSON document (reader + writer +
settings; public knowledge — the pinned reference README.md:2 only names
the platform). This module keeps that operational surface while
compiling to declarative Spark plans, so Catalyst owns optimization:

```json
{
  "reader": {
    "type": "parquet",             # parquet | csv | text | orc | json |
                                   # table (registered view) | jdbc |
                                   # warc (Common-Crawl archives) |
                                   # icetable (lake table @ version/tag) |
                                   # icetable_changes (CDF feed: lake-as-source) |
                                   # jdbc_incremental (cursor-column RDBMS
                                   #   polling sync → change events)
    "path": "/data/in.parquet",
    "column": ["url", "lang", {"value": "batch-7", "name": "tag"}],
    "where": "lang = 'en'",        # pushed to the scan by Catalyst
    "querySql": null               # full-SQL alternative to column/where
  },
  "transforms": [
    {"op": "substr",  "col": "url", "start": 9, "len": 20, "as": "host"},
    {"op": "pad",     "col": "lang", "side": "l", "len": 5, "pad": "_"},
    {"op": "replace", "col": "lang", "start": 1, "len": 2, "with": "xx"},
    {"op": "filter",  "predicate": "n_chars < 10"},   # drop-on-match
    {"op": "cast",    "col": "n_chars", "to": "double"}
  ],
  "writer": {
    "type": "parquet",             # parquet | csv | orc | json | text |
                                   # jdbc | noop | icetable (bulk LOAD) |
                                   # icetable_merge (one exactly-once MERGE epoch)
    "path": "/data/out",
    "mode": "overwrite"
  },
  "settings": {
    "errorLimit": {"percentage": 0.05},   # quarantine budget (P5)
    "speed": {"recordPerEpoch": 100000,   # HARD per-epoch record bound
                                          # (row-granular offsets, ST5)
              "shardsPerEpoch": 1,        # file-granular alternative
              "bytePerEpoch": null}       # byte bound on shard offsets
  }
}
```

The CDC ingest loop is the same spec with ``reader.type = "change_tail"``
and ``writer.type = "icetable"`` — ``run_cdc_job`` wires the epoch
driver. Batch specs run through ``run_batch_job``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataclasses import dataclass, field

from datax_spark.functions import transformers as TX


@dataclass
class JdbcReaderPlan:
    """Compiled DataX RDBMS reader (MySQL/Oracle/SqlServer/PostgreSQL/ADS
    — SURVEY.md §2.1 S1-S4/S7): the exact ``spark.read.jdbc`` call,
    including the splitPk → partitionColumn range-parallelism mapping.
    Executable end-to-end: tests/test_jdbc_exec.py drives the identical
    plan against Spark's bundled embedded Derby (partitioned scan,
    derived bounds, querySql pushdown) — MySQL/Oracle/... differ only
    in the url/driver strings, exactly DataX's per-RDBMS plugin split."""

    url: str
    table: str  # table name, or "(SELECT ...) t" when querySql is used
    properties: dict[str, str] = field(default_factory=dict)
    partition_column: str | None = None  # DataX splitPk
    lower_bound: int | None = None
    upper_bound: int | None = None
    num_partitions: int | None = None

    def load(self, spark: SparkSession) -> DataFrame:
        kwargs: dict[str, Any] = {"properties": self.properties}
        if self.partition_column is not None:
            lo, hi = self.lower_bound, self.upper_bound
            if lo is None or hi is None:
                # DataX derives the splitPk range itself; mirror that with
                # one bounds query before the partitioned scan
                # (spark.read.jdbc refuses a partition column without
                # explicit bounds). The pk must be quoted in the REMOTE
                # dialect (backticks on MySQL, double quotes elsewhere) —
                # Spark's own dialect registry knows; unquoted identifiers
                # get case-folded by the database (Derby/Oracle upcase,
                # Postgres downcases) and miss case-sensitive columns.
                pk = _quote_jdbc_ident(spark, self.url, self.partition_column)
                row = spark.read.jdbc(
                    self.url,
                    f"(SELECT MIN({pk}) AS dx_lo, MAX({pk}) AS dx_hi "
                    f"FROM {self.table}) dx_bounds",
                    properties=self.properties,
                ).collect()[0]
                # positional: alias case-folding varies by database
                lo = row[0] if lo is None else lo
                hi = row[1] if hi is None else hi
            kwargs.update(
                column=self.partition_column,
                lowerBound=lo,
                upperBound=hi,
                numPartitions=self.num_partitions or 1,
            )
        return spark.read.jdbc(self.url, self.table, **kwargs)


def compile_jdbc_reader(reader: dict[str, Any]) -> JdbcReaderPlan:
    """DataX jdbc reader config → JdbcReaderPlan. ``querySql`` replaces
    table+column+where (pushed whole to the source, like DataX);
    ``splitPk`` becomes partitionColumn range parallelism — Spark's
    executors each scan one pk range, DataX's channel-per-split model."""
    conn = reader.get("connection", {})
    props = {
        k: str(v)
        for k, v in {
            "user": reader.get("username"),
            "password": reader.get("password"),
            "driver": reader.get("driver"),
            "fetchsize": reader.get("fetchSize"),
        }.items()
        if v is not None
    }
    if reader.get("querySql"):
        table = f"({reader['querySql']}) dx_query"
    else:
        table = conn.get("table") or reader["table"]
    split_pk = reader.get("splitPk")
    return JdbcReaderPlan(
        url=conn.get("jdbcUrl") or reader["jdbcUrl"],
        table=table,
        properties=props,
        partition_column=split_pk,
        lower_bound=reader.get("splitLowerBound"),
        upper_bound=reader.get("splitUpperBound"),
        num_partitions=reader.get("numPartitions"),
    )


def compile_jdbc_plans(reader: dict[str, Any]) -> list[JdbcReaderPlan]:
    """DataX's sharded-source config (分库分表, public plugin docs):
    ``connection`` may be a LIST of entries, each naming one database
    (``jdbcUrl`` — itself a list in DataX, first entry preferred, rest
    failover) and a LIST of same-schema tables; the logical source is
    the union of every (database, table) shard. Each shard compiles to
    its own JdbcReaderPlan — splitPk range-parallelism applies WITHIN a
    shard, so total scan parallelism is shards × numPartitions, exactly
    DataX's channel-per-split fan-out. Per-connection ``querySql``
    (also a list in DataX) replaces the table list for that database."""
    conns = reader.get("connection")
    if not isinstance(conns, list):
        return [compile_jdbc_reader(reader)]
    plans: list[JdbcReaderPlan] = []
    for conn in conns:
        urls = conn.get("jdbcUrl") or reader.get("jdbcUrl")
        url = urls[0] if isinstance(urls, (list, tuple)) else urls
        qsqls = conn.get("querySql")
        if qsqls:
            qsqls = qsqls if isinstance(qsqls, (list, tuple)) else [qsqls]
            for q in qsqls:
                sub = {**reader, "querySql": q,
                       "connection": {"jdbcUrl": url}}
                plans.append(compile_jdbc_reader(sub))
            continue
        tables = conn.get("table") or reader.get("table")
        tables = tables if isinstance(tables, (list, tuple)) else [tables]
        for tbl in tables:
            sub = {**reader, "connection": {"jdbcUrl": url, "table": tbl}}
            sub.pop("querySql", None)
            plans.append(compile_jdbc_reader(sub))
    if not plans:
        raise ValueError("reader.connection lists no (jdbcUrl, table) shard")
    return plans


# DataX column types (public plugin docs) → Spark SQL types
_DATAX_TYPES = {
    "long": "bigint", "double": "double", "string": "string",
    "date": "timestamp", "boolean": "boolean", "bytes": "binary",
}


def _scan_filter(tbl, f) -> tuple:
    """One JSON ``[col, op, literal]`` filter triple → plan_scan form;
    ISO strings coerce to the column's temporal type so job specs can
    state `["warc_ts", ">=", "2026-01-15T00:00:00"]` without a literal
    syntax of their own."""
    import datetime as _dt

    if not isinstance(f, (list, tuple)) or len(f) != 3:
        raise ValueError(f"reader.filters entries are [col, op, literal]; got {f!r}")
    col, op, val = f
    dt = {fl.name: fl.dataType for fl in tbl.schema().fields}.get(col)
    if isinstance(val, str):
        if isinstance(dt, T.TimestampType):
            val = _dt.datetime.fromisoformat(val)
        elif isinstance(dt, T.DateType):
            val = _dt.date.fromisoformat(val)
    return (col, op, val)


def _resolve_catalog_path(spark: SparkSession, spec: dict[str, Any]) -> dict[str, Any]:
    """Name-addressed endpoints: ``{"catalog": <warehouse>, "table":
    "ns.tbl"}`` resolves to the storage path so jobs reference names,
    not locations (the metastore pattern). No-op when "path" is given
    directly."""
    if "path" not in spec and "catalog" in spec and "table" in spec:
        from datax_spark.icetable.catalog import Catalog

        spec = dict(spec)
        spec["path"] = str(
            Catalog(spark, spec["catalog"]).table_path(spec["table"])
        )
    return spec


def compile_reader(spark: SparkSession, reader: dict[str, Any]) -> DataFrame:
    reader = _resolve_catalog_path(spark, reader)
    rtype = reader.get("type", "parquet")
    if rtype == "jdbc":
        plans = compile_jdbc_plans(reader)
        df = plans[0].load(spark)
        for p in plans[1:]:  # sharded source: union of same-schema shards
            df = df.unionByName(p.load(spark))
    elif reader.get("querySql"):
        return spark.sql(reader["querySql"])
    elif rtype == "parquet":
        df = spark.read.parquet(str(reader["path"]))
    elif rtype == "csv":
        r = spark.read.option(
            "header", str(reader.get("header", True)).lower()
        ).option("sep", reader.get("delimiter", ","))
        # DataX txtfilereader knobs, mirrored from the writer side
        if reader.get("nullFormat") is not None:
            r = r.option("nullValue", reader["nullFormat"])
        if reader.get("encoding"):
            r = r.option("encoding", reader["encoding"])
        if reader.get("dateFormat"):
            r = r.option("dateFormat", reader["dateFormat"])
        if reader.get("timestampFormat"):
            r = r.option("timestampFormat", reader["timestampFormat"])
        if reader.get("compress"):
            r = r.option("compression", reader["compress"])
        # explicit schema wins (one pass); otherwise infer (extra pass —
        # fine for DataX-style file sync, not for the CDC hot path)
        r = r.schema(reader["schema"]) if reader.get("schema") else r.option(
            "inferSchema", "true"
        )
        df = r.csv(str(reader["path"]))
    elif rtype == "text":
        df = spark.read.text(str(reader["path"]))
    elif rtype == "datagen_const":
        # DataX streamreader (test connector): N rows of constant
        # columns — spark.range so generation distributes
        df = spark.range(int(reader.get("count", 1))).select(
            *[
                F.lit(c.get("value")).cast(c.get("dtype", "string")).alias(
                    c.get("name", f"col{i}")
                )
                for i, c in enumerate(reader.get("columns", []))
            ]
        )
    elif rtype == "orc":
        df = spark.read.orc(str(reader["path"]))
    elif rtype == "json":
        df = spark.read.json(str(reader["path"]))
    elif rtype == "table":
        df = spark.read.table(reader["table"])
    elif rtype == "warc":
        # Common-Crawl web archives as a source (sources/warc.py):
        # binaryFile distribution + Arrow-batched record explode;
        # malformed archives become quarantine-able error rows
        from datax_spark.sources.warc import read_warc

        df = read_warc(
            spark,
            str(reader["path"]),
            record_types=tuple(reader.get("recordTypes", ["response"])),
        )
    elif rtype == "icetable":
        # lake table as a batch source — current snapshot, an int
        # version, or a named tag (reader.version: 3 | "prod").
        # reader.filters = [[col, op, literal], ...] (ANDed) takes the
        # stats-pruned scan path: files whose per-column [min,max]
        # envelopes exclude the conjunction are never opened, and the
        # exact predicate still applies as a residual — DataX's `where`
        # pushdown, but at the manifest level instead of the row level
        from datax_spark.icetable.table import IceTable

        tbl = IceTable.load(spark, reader["path"])
        filters = reader.get("filters")
        if filters:
            df = tbl.scan(
                [_scan_filter(tbl, f) for f in filters],
                version=reader.get("version"),
            )
        else:
            df = tbl.read(version=reader.get("version"))
    elif rtype == "icetable_changes":
        # lake-as-source: the changelog feed of an icetable between two
        # versions, already shaped as a change-event batch (op/lsn/key +
        # payload) — chain it into writer.type "icetable_merge" for
        # lake-to-lake sync, or any batch writer for an export
        from datax_spark.icetable.table import IceTable

        tbl = IceTable.load(spark, reader["path"])
        df = (
            tbl.read_changes(
                int(reader.get("fromVersion", 0)),
                reader.get("toVersion"),
                # four-op Delta-CDF form (UB/UA update images) — what the
                # icetable_view_refresh sink's maintainer consumes
                pre_images=bool(reader.get("preImages", False)),
            )
            .withColumnRenamed("_op", "op")
            .withColumnRenamed("_lsn", "lsn")
        )
    elif rtype == "debezium":
        # Debezium envelope tail (sources/debezium.py): a directory of
        # JSON-lines envelope files — what a Kafka-topic dump or a
        # Connect file sink produces — parsed into the canonical
        # change-event shape (lsn, op, key, *payload). Chain into
        # writer.type "icetable_merge" and the public CDC wire feeds
        # the exactly-once sink directly. reader.rowSchema is the
        # payload row as Spark DDL ("url string, warc_ts timestamp,
        # html binary, ..."); parse failures surface as the quarantine
        # predicate's dirty shape, never as job crashes.
        from pyspark.sql import types as T

        from datax_spark.sources.debezium import parse_debezium

        df = parse_debezium(
            spark.read.text(str(reader["path"])),
            T.StructType.fromDDL(reader["rowSchema"]),
            lsn_field=reader.get("lsnField", "lsn"),
        )
    else:
        raise ValueError(f"unknown reader type {rtype!r}")
    if reader.get("positional"):
        # DataX hdfsreader positional projection over delimited text:
        # {"index": i, "type": t} → the i-th column BY POSITION, cast +
        # named. Selecting df.columns[i] (not _c{i}) keeps this correct
        # when a header row named the columns (skipHeader configs).
        src_cols = df.columns
        bad = [c["index"] for c in reader["positional"]
               if c["index"] >= len(src_cols)]
        if bad:
            raise ValueError(
                f"positional column index(es) {bad} out of range — the "
                f"source parsed {len(src_cols)} columns"
            )
        df = df.select(
            *[
                F.col(src_cols[c["index"]])
                .cast(_DATAX_TYPES.get(str(c.get("type", "string")).lower(), "string"))
                .alias(c.get("name", f"col{c['index']}"))
                for c in reader["positional"]
            ]
        )
    cols = reader.get("column")
    if cols:
        sel = []
        for c in cols:
            if isinstance(c, dict):  # DataX constant-column entry
                sel.append(F.lit(c["value"]).alias(c.get("name", "const")))
            else:
                sel.append(F.col(c))
        df = df.select(*sel)
    if reader.get("where"):
        df = df.filter(reader["where"])
    return df


# hidden column carrying the conjunction of every strict_cast ok-flag in
# a transform chain (present only when the job tracks an error budget)
CAST_OK_COL = "_cast_ok"


def apply_transforms(
    df: DataFrame,
    transforms: list[dict[str, Any]],
    track_cast_ok: bool = False,
) -> DataFrame:
    ok_tmp: list[str] = []
    for t in transforms or []:
        op = t["op"]
        if "colIndex" in t and "col" not in t:
            # stock DataX transformers address Record columns BY
            # POSITION (compat.py translation); resolve against the
            # frame's current column order at apply time
            idx = int(t["colIndex"])
            if idx >= len(df.columns):
                raise ValueError(
                    f"transformer columnIndex {idx} out of range — the "
                    f"record has {len(df.columns)} columns {df.columns}"
                )
            t = {**t, "col": df.columns[idx]}
        if op == "substr":
            df = df.withColumn(
                t.get("as", t["col"]), TX.dx_substr(t["col"], t["start"], t["len"])
            )
        elif op == "pad":
            df = df.withColumn(
                t.get("as", t["col"]),
                TX.dx_pad(t["col"], t["side"], t["len"], t["pad"]),
            )
        elif op == "replace":
            df = df.withColumn(
                t.get("as", t["col"]),
                TX.dx_replace(t["col"], t["start"], t["len"], t["with"]),
            )
        elif op == "filter":
            df = TX.dx_filter(df, t["predicate"])
        elif op == "dxFilter":
            # stock dx_filter: DROP the record when the condition
            # matches. "like"/"not like" are Java Pattern.matches —
            # full-string regex — hence the ^(?:…)$ anchor; comparisons
            # go numeric when both sides parse as numbers (DataX
            # compares in the column's type).
            c = F.col(t["col"])
            cmp, val = t["cmp"], str(t["value"])
            if cmp in ("like", "not like"):
                cond = c.rlike(f"^(?:{val})$")
                if cmp == "not like":
                    cond = ~cond
            else:
                ops = {
                    ">": Column.__gt__, "<": Column.__lt__,
                    ">=": Column.__ge__, "<=": Column.__le__,
                    "=": Column.__eq__, "==": Column.__eq__,
                    "!=": Column.__ne__,
                }
                if cmp not in ops:
                    raise ValueError(
                        f"dx_filter operator {cmp!r} — one of "
                        f"{sorted(ops)} or like/not like"
                    )
                # DataX compares in the COLUMN's type: numeric columns
                # get a numeric comparison, string columns a string one
                # (so a string '007' does not numerically equal 7)
                numeric_col = isinstance(
                    df.schema[t["col"]].dataType, T.NumericType
                )
                if numeric_col:
                    try:
                        lhs, rhs = c.cast("double"), F.lit(float(val))
                    except ValueError:
                        lhs, rhs = c.cast("string"), F.lit(val)
                else:
                    lhs, rhs = c, F.lit(val)
                cond = ops[cmp](lhs, rhs)
            # null condition (null value / failed numeric cast) = no
            # match = record KEPT, explicitly
            df = df.filter(~F.coalesce(cond, F.lit(False)))
        elif op == "mapValues":
            # value remapping (the canonical dead-letter repair rule:
            # legacy op codes → canonical ones): a chained CASE WHEN,
            # fully codegen'd, unmapped values pass through unchanged
            col = F.col(t["col"])
            out = None
            for src, dst in t["mapping"].items():
                cond = col == F.lit(src)
                out = F.when(cond, F.lit(dst)) if out is None else out.when(
                    cond, F.lit(dst)
                )
            df = df.withColumn(
                t.get("as", t["col"]), out.otherwise(col) if out is not None else col
            )
        elif op == "cast":
            casted, ok = TX.strict_cast(t["col"], t["to"])
            if track_cast_ok:
                # materialize the ok-flag BEFORE the cast overwrites the
                # source column — it compares pre- and post-cast values
                name = f"_ok_{len(ok_tmp)}"
                df = df.withColumn(name, ok)
                ok_tmp.append(name)
            df = df.withColumn(t.get("as", t["col"]), casted)
        # ---- corpus-pipeline transforms: the training-data operator ----
        # library reachable from a job spec (one CLI run = one prep
        # pipeline; each is a thin dispatch onto datax_spark.operators)
        elif op == "canonicalizeUrl":
            from datax_spark.functions.url import canonical_url

            col = t.get("col", "url")
            df = df.withColumn(t.get("as", col), canonical_url(F.col(col)))
        elif op == "lineDedup":
            from datax_spark.operators.dedup import line_dedup

            df = line_dedup(
                df,
                sep=t.get("sep", "\n"),
                id_col=t.get("idCol", "doc_id"),
                text_col=t.get("textCol", "text"),
            )
        elif op == "curate":
            from datax_spark.operators.curation import curate

            # absent key -> the operator's default ('en',); an explicit
            # null disables the language gate (spec and API must agree)
            langs = t["langs"] if "langs" in t else ["en"]
            df = curate(
                df,
                min_quality=t.get("minQuality", 0.8),
                langs=tuple(langs) if langs is not None else None,
                id_col=t.get("idCol", "doc_id"),
                text_col=t.get("textCol", "text"),
                keep_cols=tuple(t.get("keepCols", ("source",))),
            )
        elif op == "chunk":
            from datax_spark.operators.chunking import chunk_documents

            df = chunk_documents(
                df,
                chunk_tokens=t.get("chunkTokens", 512),
                overlap=t.get("overlap", 64),
                id_col=t.get("idCol", "doc_id"),
                text_col=t.get("textCol", "text"),
            )
        elif op == "pack":
            from datax_spark.operators.chunking import pack_documents

            df = pack_documents(
                df,
                context_tokens=t.get("contextTokens", 2048),
                by=t.get("by", "source"),
                id_col=t.get("idCol", "doc_id"),
                token_col=t.get("tokenCol", "n_tokens"),
            )
        elif op == "tokenize":
            from datax_spark.functions.tokenize import build_vocab, encode

            size = int(t.get("vocabSize", 4096))
            df = encode(
                df,
                build_vocab(
                    df, size,
                    id_col=t.get("idCol", "doc_id"),
                    text_col=t.get("textCol", "text"),
                    min_freq=int(t.get("minFreq", 1)),
                ),
                vocab_size=size,
                oov_buckets=int(t.get("oovBuckets", 16)),
                id_col=t.get("idCol", "doc_id"),
                text_col=t.get("textCol", "text"),
            )
        elif op == "gopherFilter":
            from datax_spark.functions.text import gopher_pass, gopher_signals

            sig = gopher_signals(F.col(t.get("textCol", "text")))
            thr = {
                snake: t[camel]
                for camel, snake in (
                    ("minWords", "min_words"),
                    ("maxWords", "max_words"),
                    ("minMeanWordLen", "min_mean_word_len"),
                    ("maxMeanWordLen", "max_mean_word_len"),
                    ("maxSymbolWordRatio", "max_symbol_word_ratio"),
                    ("maxBulletLineFrac", "max_bullet_line_frac"),
                    ("maxEllipsisLineFrac", "max_ellipsis_line_frac"),
                    ("minAlphaWordFrac", "min_alpha_word_frac"),
                    ("minStopwords", "min_stopwords"),
                )
                if camel in t
            }
            df = df.filter(gopher_pass(sig, **thr))
        elif op == "decontaminate":
            from datax_spark.operators.decontaminate import decontaminate

            bench = compile_reader(df.sparkSession, t["benchmark"])
            df = decontaminate(
                df,
                bench,
                n=t.get("n", 3),
                min_hits=t.get("minHits", 1),
                id_col=t.get("idCol", "doc_id"),
                text_col=t.get("textCol", "text"),
                bench_text_col=t.get("benchTextCol", "text"),
            )
        elif op == "redactPii":
            from datax_spark.functions.pii import redact_pii

            col = t.get("col", "text")
            df = df.withColumn(t.get("as", col), redact_pii(F.col(col)))
        elif op == "stratify":
            from datax_spark.operators.sampling import stratified_sample

            df = stratified_sample(
                df,
                dict(t["fractions"]),
                by=t.get("by", "source"),
                key_col=t.get("keyCol", "doc_id"),
                default_fraction=float(t.get("defaultFraction", 0.0)),
            )
        elif op == "sample":
            from datax_spark.operators.sampling import deterministic_sample

            df = deterministic_sample(
                df, t["fraction"], key_col=t.get("keyCol", "doc_id")
            )
        elif op == "tokenBudget":
            from datax_spark.operators.sampling import token_budget_sample

            df = token_budget_sample(
                df,
                t["budgetTokens"],
                by=t.get("by", "source"),
                id_col=t.get("idCol", "doc_id"),
                token_col=t.get("tokenCol", "n_tokens"),
                quality_col=t.get("qualityCol", "quality"),
            )
        elif op == "dsirSelect":
            # DSIR importance resampling (operators/dsir.py): keep the
            # n raw docs that look most like the target corpus. The
            # target is its own reader spec (any source the engine
            # reads), so "select webtext that reads like Wikipedia" is
            # one job config.
            from datax_spark.operators.dsir import dsir_select

            target = compile_reader(df.sparkSession, t["target"])
            df = dsir_select(
                target,
                df,
                n=int(t["n"]),
                id_col=t.get("idCol", "doc_id"),
                text_col=t.get("textCol", "text"),
                n_buckets=int(t.get("nBuckets", 1024)),
                seed=t.get("seed", "dsir"),
                alpha=float(t.get("alpha", 1.0)),
                gumbel=bool(t.get("gumbel", True)),
            ).join(df, t.get("idCol", "doc_id"), "inner")
        elif op == "clusterSplit":
            # leakage-safe train/val/test tagging (operators/splits.py):
            # adds cluster_id + split columns; downstream filters or
            # partitioned writers consume the split column
            from datax_spark.operators.splits import leakage_safe_split

            fr = t.get("fractions", [0.8, 0.1, 0.1])
            lab = leakage_safe_split(
                df,
                fractions=(float(fr[0]), float(fr[1]), float(fr[2])),
                seed=t.get("seed", "split"),
                id_col=t.get("idCol", "doc_id"),
                text_col=t.get("textCol", "text"),
                jaccard_threshold=float(t.get("jaccardThreshold", 0.7)),
            )
            df = df.join(lab, t.get("idCol", "doc_id"), "inner")
        elif op == "normalizeUnicode":
            from datax_spark.functions.unicode import clean_unicode

            col = t.get("col", "text")
            df = df.withColumn(
                t.get("as", col),
                clean_unicode(
                    F.col(col),
                    form=t.get("form", "NFKC"),
                    casefold=bool(t.get("casefold", False)),
                ),
            )
        elif op == "dropOutliers":
            from datax_spark.operators.anomaly import zscore_inliers

            df = zscore_inliers(
                df, t["col"], t.get("by", []), k=float(t.get("k", 3.0))
            )
        elif op == "expect":
            from datax_spark.operators import expectations as _X

            _X.enforce(df, _X.parse_constraints(t["constraints"]))
        elif op == "zorder":
            from datax_spark.operators.layout import zorder_sort, zvalue

            df = zorder_sort(
                df,
                zvalue(t["cols"], bits=int(t.get("bits", 8))),
                num_partitions=t.get("numPartitions"),
            )
        elif op == "shard":
            from datax_spark.operators.export import shard_id

            df = df.withColumn(
                t.get("as", "shard"),
                shard_id(t.get("keyCol", "doc_id"), int(t["nShards"])),
            )
        elif op == "timeRollup":
            from datax_spark.operators.rollup_time import time_rollup

            df = time_rollup(
                df,
                t.get("tsCol", "ts"),
                t.get("groupCols", []),
                t["valueCol"],
                tuple(t.get("resolutions", ("hour", "day"))),
            )
        else:
            raise ValueError(f"unknown transform {op!r}")
    if track_cast_ok:
        acc = F.lit(True)
        for name in ok_tmp:
            acc = acc & F.col(name)
        df = df.withColumn(CAST_OK_COL, acc).drop(*ok_tmp)
    return df


def _write_batch_output(spark: SparkSession, df: DataFrame, writer: dict[str, Any]) -> None:
    """Writer dispatch shared by the plain and errorLimit paths;
    runs postSql after a successful write."""
    if writer:
        writer = _resolve_catalog_path(spark, writer)
        wtype = writer.get("type", "parquet")
        mode = writer.get("mode", "error")
        def _file_writer():
            # shared DataX hdfswriter-style knobs for every file format:
            # hive-style partition dirs (partitionBy), output compression
            # (compress: gzip/snappy/zstd/... — format-appropriate), and
            # a per-file record cap (maxRecordsPerFile: bounds single
            # files on skewed partitions without a repartition)
            w = df.write.mode(mode)
            pb = writer.get("partitionBy")
            if pb:
                w = w.partitionBy(*([pb] if isinstance(pb, str) else pb))
            if writer.get("compress"):
                w = w.option("compression", writer["compress"])
            if writer.get("maxRecordsPerFile"):
                w = w.option(
                    "maxRecordsPerFile", int(writer["maxRecordsPerFile"])
                )
            return w

        if wtype == "parquet":
            _file_writer().parquet(str(writer["path"]))
        elif wtype == "csv":
            w = (
                _file_writer()
                .option("header", str(writer.get("header", True)).lower())
                .option("sep", writer.get("delimiter", ","))
            )
            # DataX txtfilewriter knobs: nullFormat (the string written
            # for NULL), encoding, date/timestamp rendering
            if writer.get("nullFormat") is not None:
                w = w.option("nullValue", writer["nullFormat"])
            if writer.get("encoding"):
                w = w.option("encoding", writer["encoding"])
            if writer.get("dateFormat"):
                w = w.option("dateFormat", writer["dateFormat"])
            if writer.get("timestampFormat"):
                w = w.option("timestampFormat", writer["timestampFormat"])
            w.csv(str(writer["path"]))
        elif wtype == "orc":
            _file_writer().orc(str(writer["path"]))
        elif wtype == "json":
            _file_writer().json(str(writer["path"]))
        elif wtype == "text":
            _file_writer().text(str(writer["path"]))
        elif wtype == "debezium":
            # CDC egress in the public wire format: a canonical
            # change-event feed (e.g. reader.type "icetable_changes")
            # serialized to Debezium envelope JSON lines — any
            # third-party Debezium consumer can tail the output.
            from datax_spark.sources.debezium import to_debezium

            to_debezium(
                df,
                lsn_col=writer.get("lsnCol", "lsn"),
                op_col=writer.get("opCol", "op"),
            ).write.mode(mode).text(str(writer["path"]))
        elif wtype == "webdataset":
            # training-loader egress: deterministic tar shards + a
            # printed manifest row per shard (operators/export.py)
            import json

            from datax_spark.operators.export import export_webdataset

            man = export_webdataset(
                df,
                str(writer["path"]),
                key_col=writer.get("keyCol", "doc_id"),
                n_shards=int(writer["nShards"]),
                text_col=writer.get("textCol", "text"),
                meta_cols=writer.get("metaCols"),
            )
            for r in man.toLocalIterator():
                print(json.dumps(r.asDict(), sort_keys=True))
        elif wtype == "jdbc":
            # DataX RDBMS writer (S1-S4/S7 write side; executable — see
            # tests/test_jdbc_exec.py against embedded Derby);
            # writeMode insert/replace maps onto append/overwrite
            df.write.mode(
                {"insert": "append", "replace": "overwrite"}.get(
                    writer.get("writeMode", "insert"), mode
                )
            ).jdbc(
                writer["jdbcUrl"],
                writer["table"],
                properties={
                    k: str(v)
                    for k, v in {
                        "user": writer.get("username"),
                        "password": writer.get("password"),
                        "driver": writer.get("driver"),
                    }.items()
                    if v is not None
                },
            )
        elif wtype == "table":
            # Hive-style partitioned catalog table (DataX S6): metastore
            # entry + partition directories; readers get partition
            # pruning on the partitionBy columns for free.
            # staticPartition {"pt": "20230101"} (ODPS/Hive tunnel
            # semantics): the data carries no partition column — the
            # constant is added here, and overwrite replaces ONLY the
            # named partition of an existing table (dynamic partition
            # overwrite on insertInto), never the whole table.
            for k, v in (writer.get("staticPartition") or {}).items():
                if k not in df.columns:
                    df = df.withColumn(k, F.lit(v))
            w = df.write.mode(mode)
            if writer.get("partitionBy"):
                w = w.partitionBy(*writer["partitionBy"])
            if writer.get("path"):
                w = w.option("path", str(writer["path"]))  # external table
            if (
                writer.get("staticPartition")
                and spark.catalog.tableExists(writer["table"])
            ):
                saved = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
                spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", "dynamic"
                )
                try:
                    # insertInto is positional: align to the table schema
                    tbl_cols = spark.read.table(writer["table"]).columns
                    df.select(*tbl_cols).write.insertInto(
                        writer["table"], overwrite=(mode == "overwrite")
                    )
                finally:
                    spark.conf.set(
                        "spark.sql.sources.partitionOverwriteMode", saved
                    )
            else:
                w.saveAsTable(writer["table"])
        elif wtype == "icetable":
            # ADS bulk load (DataX S7): one-shot LOAD OVERWRITE into the
            # lake table, atomic snapshot replace with the same layout
            # invariants (url-hash pids, key sort, blooms, _lsn) the CDC
            # merge path needs to resume on top of it
            from datax_spark.icetable.table import IceTable

            root = Path(writer["path"])
            if (root / "metadata" / "version-hint.text").exists():
                tbl = IceTable.load(spark, root)
            else:
                schema = T.StructType(
                    [
                        T.StructField(f.name, f.dataType, True)
                        for f in df.schema.fields
                        if f.name != writer.get("lsnColumn")
                    ]
                )
                tbl = IceTable.create(
                    spark,
                    root,
                    schema,
                    num_partitions=int(writer.get("numPartitions", 32)),
                    key_column=writer.get("keyColumn", "url"),
                )
            tbl.bulk_overwrite(
                df,
                epoch=int(writer.get("epoch", 0)),
                lsn_col=writer.get("lsnColumn"),
                base_lsn=int(writer.get("baseLsn", 0)),
            )
        elif wtype == "icetable_merge":
            # apply the batch as ONE exactly-once MERGE epoch (op/lsn
            # columns required — the icetable_changes reader emits them),
            # so lake-to-lake sync is a single job spec end to end
            from datax_spark.icetable.table import IceTable
            from datax_spark.operators.merge import apply_epoch

            missing = {"op", "lsn"} - set(df.columns)
            if missing and writer.get("synthesizeOps"):
                # keyed-put sinks (OTS PutRow / HBase put — compat.py
                # otswriter/hbase11xwriter): a batch write IS a batch of
                # full-image upserts; the epoch number (resolved below)
                # becomes every row's lsn, so later batches win LWW
                if "op" in missing:
                    df = df.withColumn("op", F.lit("I"))
                missing = {"lsn"} & missing
            elif missing:
                raise ValueError(
                    f"icetable_merge needs change-event columns {sorted(missing)} "
                    "— read from icetable_changes/change_tail, or use "
                    "icetable_diff_merge for a plain snapshot"
                )
            root = Path(writer["path"])
            if (root / "metadata" / "version-hint.text").exists():
                tbl = IceTable.load(spark, root)
            else:
                key_column = writer.get("keyColumn", "url")
                if key_column not in df.columns:
                    # fail HERE with the fix spelled out, not later with
                    # apply_epoch's opaque missing-column AnalysisException
                    raise ValueError(
                        f"icetable_merge auto-create: key column "
                        f"{key_column!r} is not in the feed's columns "
                        f"{sorted(c for c in df.columns if c not in ('op', 'lsn'))} "
                        f"— set writer.keyColumn to one of them"
                    )
                schema = T.StructType(
                    [
                        T.StructField(f.name, f.dataType, True)
                        for f in df.schema.fields
                        if f.name not in ("op", "lsn")
                    ]
                )
                tbl = IceTable.create(
                    spark,
                    root,
                    schema,
                    num_partitions=int(writer.get("numPartitions", 16)),
                    key_column=key_column,
                    # Iceberg-style write knobs (compression codec,
                    # max records per file) — see IceTable.properties
                    properties=writer.get("properties"),
                )
            committed = tbl.committed_epochs()
            epoch = writer.get("epoch")
            if epoch is None:
                epoch = (max(committed) + 1) if committed else 0
            if "lsn" not in df.columns:
                # synthesizeOps path: the batch's lsn is epoch+1 (strictly
                # positive — lsn ≤ 0 is the dirty-row rule — and monotone,
                # so later put batches win LWW)
                df = df.withColumn("lsn", F.lit(int(epoch) + 1).cast("long"))
            wap = writer.get("wap")
            if wap:
                # write-audit-publish: apply, audit the post-image with
                # the declared constraints, fast-forward the prod tag or
                # roll back (operators/wap.py). A failed audit raises so
                # the job exits non-zero — the DataX errorLimit analogue
                # at table level.
                from datax_spark.operators.expectations import parse_constraints
                from datax_spark.operators.wap import wap_apply

                report = wap_apply(
                    tbl,
                    df,
                    epoch=int(epoch),
                    checks=parse_constraints(wap["constraints"]),
                    prod_tag=wap.get("prodTag", "prod"),
                    audit_affected_only=bool(wap.get("auditAffectedOnly", False)),
                    key_col=writer.get("keyColumn", "url"),
                    extract=bool(writer.get("extract", False)),
                    merge_strategy=writer.get("mergeStrategy", "auto"),
                )
                if not report["published"] and not report["stats"].skipped:
                    failed = [
                        f"{r['constraint']}: metric {r['metric']} < {r['threshold']}"
                        for r in report["audit"]
                        if not r["passed"]
                    ]
                    raise ValueError(
                        "wap audit failed — table rolled back, prod tag "
                        "unmoved: " + "; ".join(failed)
                    )
            else:
                apply_epoch(
                    tbl,
                    df,
                    epoch=int(epoch),
                    extract=bool(writer.get("extract", False)),
                    merge_strategy=writer.get("mergeStrategy", "auto"),
                )
        elif wtype == "icetable_merge_into":
            # SQL MERGE INTO clause semantics over the incoming batch
            # (operators/rowlevel.merge_into): the batch is the USING
            # source (no op/lsn columns needed — the clauses decide),
            # conditions/SET expressions reference source./target. as
            # SQL strings. writer.epoch is the idempotent retry handle.
            from datax_spark.icetable.table import IceTable
            from datax_spark.operators.rowlevel import merge_into

            root = Path(writer["path"])
            if (root / "metadata" / "version-hint.text").exists():
                tbl = IceTable.load(spark, root)
            else:
                key_column = writer.get("keyColumn", "url")
                if key_column not in df.columns:
                    raise ValueError(
                        f"icetable_merge_into auto-create: key column "
                        f"{key_column!r} is not in the source's columns "
                        f"{sorted(df.columns)} — set writer.keyColumn"
                    )
                schema = T.StructType(
                    [T.StructField(f.name, f.dataType, True) for f in df.schema.fields]
                )
                tbl = IceTable.create(
                    spark,
                    root,
                    schema,
                    num_partitions=int(writer.get("numPartitions", 16)),
                    key_column=key_column,
                    properties=writer.get("properties"),
                )
            kwargs = dict(
                when_matched_update=writer.get("whenMatchedUpdate"),
                when_matched_update_condition=writer.get("whenMatchedUpdateCondition"),
                when_matched_delete=bool(writer.get("whenMatchedDelete", False)),
                when_matched_delete_condition=writer.get("whenMatchedDeleteCondition"),
                when_not_matched_insert=writer.get("whenNotMatchedInsert", "*"),
                when_not_matched_insert_condition=writer.get(
                    "whenNotMatchedInsertCondition"
                ),
            )
            if writer.get("epoch") is not None:
                kwargs["epoch"] = int(writer["epoch"])
            merge_into(tbl, df, **kwargs)
        elif wtype == "icetable_diff_merge":
            # recrawl ingestion: diff the incoming SNAPSHOT against the
            # table state (operators/snapshot_diff.py — unchanged keys
            # emit nothing) and apply the minimal batch as one
            # exactly-once MERGE epoch. emitDeletes only for full crawls.
            from datax_spark.icetable.table import IceTable
            from datax_spark.operators.merge import apply_epoch
            from datax_spark.operators.snapshot_diff import snapshot_to_events

            tbl = IceTable.load(spark, Path(writer["path"]))
            events = snapshot_to_events(
                tbl, df, emit_deletes=bool(writer.get("emitDeletes", False))
            )
            committed = tbl.committed_epochs()
            epoch = writer.get("epoch")
            if epoch is None:
                epoch = (max(committed) + 1) if committed else 0
            apply_epoch(
                tbl,
                events,
                epoch=int(epoch),
                extract=bool(writer.get("extract", False)),
                merge_strategy=writer.get("mergeStrategy", "auto"),
            )
        elif wtype == "icetable_view_refresh":
            # incremental materialized-view maintenance: the input is a
            # PRE-IMAGE change feed (reader icetable_changes with
            # preImages: true — ops I/D/UB/UA), the target a tiny
            # grouped-aggregate IceTable. The source table is NEVER
            # re-scanned: the previous view + the churn-sized delta
            # produce the next view, published as one atomic snapshot
            # replace (the view is |groups| rows, so the rewrite is
            # metadata-cheap even when the source is 100 TB). Bootstrap
            # needs no special case: an absent cursor tag makes the
            # reader emit the full state as I-rows, and maintaining an
            # EMPTY view with an all-insert feed IS the full aggregate.
            from datax_spark.icetable.table import IceTable
            from datax_spark.operators.incremental_view import (
                agg_view,
                maintain_agg_view,
            )

            group_cols = list(writer["groupCols"])
            sum_cols = list(writer.get("sumCols", []))
            missing = ({"op"} | set(group_cols) | set(sum_cols)) - set(
                df.columns
            )
            if missing:
                raise ValueError(
                    f"icetable_view_refresh: feed lacks columns "
                    f"{sorted(missing)} — read from icetable_changes "
                    f"with preImages: true"
                )
            changes = df.withColumnRenamed("op", "_op")
            root = Path(writer["path"])
            # the view key: one synthetic column concatenating the group
            # columns (IceTable keys are single-column); unit separator
            # keeps multi-column groups collision-free
            key_parts = [
                F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                for c in group_cols
            ]
            empty = agg_view(
                changes.select(*group_cols, *sum_cols).limit(0),
                group_cols,
                sum_cols,
            )
            if (root / "metadata" / "version-hint.text").exists():
                tbl = IceTable.load(spark, root)
                view = tbl.read().drop("view_key")
            else:
                tbl = IceTable.create(
                    spark,
                    root,
                    T.StructType(
                        [T.StructField("view_key", T.StringType(), True)]
                        + [
                            T.StructField(f.name, f.dataType, True)
                            for f in empty.schema.fields
                        ]
                    ),
                    num_partitions=int(writer.get("numPartitions", 4)),
                    key_column="view_key",
                )
                view = empty
            maintained = maintain_agg_view(
                view, changes, group_cols, sum_cols
            ).withColumn("view_key", F.concat_ws("\x1f", *key_parts))
            committed = tbl.committed_epochs()
            epoch = writer.get("epoch")
            if epoch is None:
                epoch = (max(committed) + 1) if committed else 0
            tbl.bulk_overwrite(
                maintained.select(*[f.name for f in tbl.schema().fields]),
                epoch=int(epoch),
            )
        elif wtype == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            raise ValueError(f"unknown batch writer {wtype!r}")
        for stmt in writer.get("postSql", []) or []:
            spark.sql(stmt)


def run_batch_job(spark: SparkSession, spec: dict[str, Any]) -> DataFrame:
    """Compile and (if a writer is present) execute a batch sync job;
    returns the final DataFrame either way.

    When ``settings.errorLimit`` is configured, rows whose strict casts
    failed count against the budget (DataX dirty-record semantics:
    ``record`` = absolute cap, ``percentage`` = ratio cap; exceeding
    either aborts the job) and are routed to ``writer.quarantinePath``
    when given — never silently nulled into the main output.

    DataX job lifecycle hooks: ``writer.preSql`` statements run before
    the read is compiled (prepare(): staging views, truncates),
    ``writer.postSql`` after a successful write (post(): swaps, stats) —
    executed via ``spark.sql`` against the session catalog. postSql is
    NOT run when the job aborts on the error budget, matching DataX."""
    settings = spec.get("settings", {})
    err = settings.get("errorLimit")
    # DataX speed.channel: the job's parallelism knob (a PER-JOB setting
    # in DataX). Spark-first mapping: bound this job's shuffle width —
    # saved and restored around the job so the session-scoped conf never
    # leaks into later jobs — and cap the write fan-out with a coalesce
    # AFTER the transforms, so the source scan and narrow pre-shuffle
    # work keep their natural parallelism (DataX readers own their own
    # split; only the sink-side pipe count is bounded).
    channel = settings.get("speed", {}).get("channel")
    saved_shuffle = None
    if channel is not None:
        saved_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(int(channel)))
    try:
        return _run_batch_job_body(spark, spec, err, channel)
    finally:
        if saved_shuffle is not None:
            spark.conf.set("spark.sql.shuffle.partitions", saved_shuffle)


def _run_batch_job_body(
    spark: SparkSession, spec: dict[str, Any], err, channel
) -> DataFrame:
    from datax_spark.operators.quarantine import ErrorBudgetExceeded, check_error_budget

    for stmt in (spec.get("writer") or {}).get("preSql", []) or []:
        spark.sql(stmt)
    if (spec.get("writer") or {}).get("type") == "icetable_join_view":
        # maintained JOIN view as a re-runnable job: first run creates
        # the view table and bootstraps (full state as inserts via the
        # empty-v0 changelog), re-runs advance from both sources'
        # changelogs (cursor tags live on the source tables). The two
        # sources ride in the WRITER spec — the view is a function of
        # two tables, which the single-reader job model can't name.
        from datax_spark.icetable.table import IceTable
        from datax_spark.operators.incremental_view import (
            create_join_view,
            sync_join_view,
        )

        writer = _resolve_catalog_path(spark, spec["writer"])
        if spec.get("reader") not in (None, {}):
            raise ValueError(
                "icetable_join_view takes its sources from writer.pathA/"
                "pathB — leave the reader empty"
            )
        if spec.get("transforms"):
            raise ValueError(
                "icetable_join_view does not accept transforms: the view "
                "is exactly A JOIN B at the cursor versions"
            )
        a = IceTable.load(spark, writer["pathA"])
        b = IceTable.load(spark, writer["pathB"])
        root = Path(writer["path"])
        if (root / "metadata" / "version-hint.text").exists():
            view = IceTable.load(spark, root)
        else:
            view = create_join_view(
                spark, root, a, b,
                num_partitions=int(writer.get("numPartitions", 8)),
            )
        out = sync_join_view(view, a, b)
        return spark.createDataFrame(
            [(
                out["epoch"],
                out["a"][0], out["a"][1],
                out["b"][0], out["b"][1],
            )],
            "epoch long, a_from long, a_to long, b_from long, b_to long",
        )
    reader = spec["reader"]
    cursor = None  # (source table, tag name, version to pin on success)
    df = None
    _INDEX_WRITERS = {"bm25_index", "trigram_index", "ivf_index"}
    if (spec.get("writer") or {}).get("type") in _INDEX_WRITERS:
        # CDC-maintained index artifacts as re-runnable jobs: the first
        # run builds from the source table's current state and records
        # a version cursor in the index meta; every re-run consumes
        # ONLY the table changelog since that cursor (sync — tombstone
        # dead generations, one fresh segment for the changed docs).
        # The reader must be the icetable itself: the cursor is a
        # version against that table's history, so a transformed/
        # projected feed would desynchronize index and cursor.
        from datax_spark.icetable.table import IceTable

        writer = _resolve_catalog_path(spark, spec["writer"])
        wtype = writer["type"]
        rd = _resolve_catalog_path(spark, reader)
        if rd.get("type") != "icetable" or "path" not in rd:
            raise ValueError(
                f"{wtype} writer requires reader.type icetable with a "
                f"path — the sync cursor is a version of that table"
            )
        if spec.get("transforms"):
            raise ValueError(
                f"{wtype} writer does not accept transforms: the index "
                f"must mirror the table state its cursor names"
            )
        tbl = IceTable.load(spark, rd["path"])
        root = Path(writer["path"])
        if wtype == "bm25_index":
            from datax_spark.operators.text_index import Bm25Index as IndexCls

            build_kwargs = dict(
                n_buckets=int(writer.get("numBuckets", 64)),
                id_col=writer.get("idColumn", "doc_id"),
                text_col=writer.get("textColumn", "text"),
                where=writer.get("where"),
            )
        elif wtype == "trigram_index":
            from datax_spark.operators.trigram_index import (
                TrigramIndex as IndexCls,
            )

            build_kwargs = dict(
                n_buckets=int(writer.get("numBuckets", 64)),
                id_col=writer.get("idColumn", "doc_id"),
                text_col=writer.get("textColumn", "text"),
                where=writer.get("where"),
            )
        else:
            from datax_spark.operators.ann_index import IvfIndex as IndexCls

            build_kwargs = dict(
                n_cells=int(writer.get("numCells", 8)),
                n_iter=int(writer.get("numIter", 2)),
                id_col=writer.get("idColumn", "vec_id"),
                vec_col=writer.get("vecColumn", "embedding"),
            )
            if writer.get("pqM") is not None:
                build_kwargs.update(
                    pq_m=int(writer["pqM"]),
                    pq_codes=int(writer.get("pqCodes", 8)),
                    pq_dim=int(writer["pqDim"]),
                )
        if (root / "meta.json").exists():
            out = IndexCls(spark, root).sync(
                tbl, to_version=rd.get("toVersion")
            )
            action = "sync"
        else:
            idx = IndexCls.build_from_table(tbl, root, **build_kwargs)
            out = {
                "removed": 0,
                "added": int(idx.meta.get("n_docs", idx.meta.get("rows", 0))),
                "from": 0,
                "to": int(idx.meta["source"]["version"]),
            }
            action = "build"
        return spark.createDataFrame(
            [(action, out["removed"], out["added"], out.get("from"),
              out.get("to"))],
            "action string, removed long, added long, from_version long, "
            "to_version long",
        )
    if reader.get("type") == "icetable_reprocess":
        # dead-letter repair as a self-contained maintenance job: the
        # spec's transforms ARE the repair rule, applied to the table's
        # quarantine area and re-ingested through the SAME apply_epoch
        # path (operators/merge.reprocess_quarantine) — rows the
        # transforms can't fix re-quarantine under the new epoch, so a
        # repair rule that only covers some defect classes still makes
        # monotone progress. No writer: the table is both source and
        # sink. Returns a one-row stats frame (empty when the
        # quarantine area is already drained).
        from datax_spark.icetable.table import IceTable
        from datax_spark.operators.merge import reprocess_quarantine

        from datax_spark.operators.merge import REPROCESS_EPOCH_BASE

        tbl = IceTable.load(spark, reader["path"])

        def _repair(qdf: DataFrame) -> DataFrame:
            return apply_transforms(qdf, spec.get("transforms"))

        epoch = reader.get("epoch")
        if epoch is None:
            # auto-pick from the RESERVED reprocess namespace, never
            # max(committed)+1: on a CDC-driver-fed table that would be
            # exactly the driver's next epoch number (the driver numbers
            # epochs from its own offset log, not the table ledger), so
            # the driver's next ingest batch would ledger-skip and its
            # events would be silently lost
            prior = [
                e for e in tbl.committed_epochs() if e >= REPROCESS_EPOCH_BASE
            ]
            epoch = (max(prior) + 1) if prior else REPROCESS_EPOCH_BASE
        stats = reprocess_quarantine(
            tbl,
            _repair,
            epoch=int(epoch),
            extract=bool(reader.get("extract", False)),
            merge_strategy=reader.get("mergeStrategy", "auto"),
        )
        stats_schema = (
            "epoch long, skipped boolean, rows_in long, rows_dirty long, "
            "rows_upserted long, rows_deleted long"
        )
        if stats is None:
            return spark.createDataFrame([], stats_schema)
        return spark.createDataFrame(
            [
                (
                    stats.epoch,
                    stats.skipped,
                    stats.rows_in,
                    stats.rows_dirty,
                    stats.rows_upserted,
                    stats.rows_deleted,
                )
            ],
            stats_schema,
        )
    if reader.get("type") == "jdbc_incremental":
        df, cursor = _compile_jdbc_incremental(
            spark, reader, spec.get("writer") or {}
        )
        if df is None:
            # nothing past the cursor: a successful no-op — no epoch is
            # committed and the cursor stays put
            return spark.createDataFrame([], "op string, lsn long")
    if reader.get("type") == "icetable_changes" and (
        "sinceTag" in reader or "advanceTag" in reader
    ):
        # tag-driven incremental sync: read the feed SINCE the cursor
        # tag (0 = full bootstrap when the tag doesn't exist yet) up to
        # a to-version PINNED NOW — commits racing the job land after
        # the pin and are picked up by the next run — and move the tag
        # there only after the write succeeds. Re-running a failed job
        # re-reads the same span; the icetable_merge sink's exactly-once
        # epochs make the overlap harmless. This is DataX's saved sync
        # position, kept IN the source table's metadata.
        from datax_spark.icetable.table import IceTable

        src_tbl = IceTable.load(spark, reader["path"])
        reader = dict(reader)
        tag_name = reader.get("advanceTag") or reader.get("sinceTag")
        if "sinceTag" in reader:
            try:
                reader["fromVersion"] = src_tbl.resolve_ref(reader["sinceTag"])
            except KeyError:
                reader["fromVersion"] = 0
        if reader.get("toVersion") is None:
            reader["toVersion"] = src_tbl.current_version()
        cursor = (src_tbl, tag_name, reader["toVersion"])
    if df is None:
        df = compile_reader(spark, reader)
    df = apply_transforms(df, spec.get("transforms"), track_cast_ok=err is not None)
    if channel is not None:
        # cap write fan-out without forcing a shuffle on narrow plans
        df = df.coalesce(int(channel))
    writer = _resolve_catalog_path(spark, spec.get("writer") or {})
    if err is not None and CAST_OK_COL in df.columns:
        # one source pass: the budget count, the quarantine write and the
        # main write all read the persisted frame (a JDBC/CSV source
        # would otherwise be pulled up to three times, and a
        # non-deterministic source could disagree with its own count)
        df = df.persist()
        try:
            counts = df.groupBy(F.col(CAST_OK_COL)).count().collect()
            total = sum(r["count"] for r in counts)
            dirty = sum(r["count"] for r in counts if not r[CAST_OK_COL])
            check_error_budget(total, dirty, err.get("percentage"))
            cap = err.get("record")
            if cap is not None and dirty > cap:
                raise ErrorBudgetExceeded(
                    f"{dirty} dirty rows exceed record cap {cap}"
                )
            if dirty and writer.get("quarantinePath"):
                df.filter(~F.col(CAST_OK_COL)).drop(CAST_OK_COL).write.mode(
                    "overwrite"
                ).parquet(str(writer["quarantinePath"]))
            clean = df.filter(F.col(CAST_OK_COL)).drop(CAST_OK_COL)
            _write_batch_output(spark, clean, writer)
            if writer:
                _advance_cursor(cursor)
            return clean
        finally:
            df.unpersist()
    _write_batch_output(spark, df, writer)
    if writer:
        # a writer-less run is a PREVIEW (nothing was consumed) — the
        # cursor must not move or the span would be skipped forever
        _advance_cursor(cursor)
    return df


def _advance_cursor(cursor) -> None:
    """Move the sync position — only reached after a successful write
    (a failed job leaves the cursor where it was, so the next run
    re-reads the span). Tag tuple for lake-to-lake sync; a callable for
    cursors kept outside table metadata (the jdbc_incremental file)."""
    if cursor is None:
        return
    if callable(cursor):
        cursor()
        return
    src_tbl, tag_name, to_v = cursor
    if tag_name:
        src_tbl.tag(tag_name, to_v)


def _quote_jdbc_ident(spark: SparkSession, url: str, ident: str) -> str:
    """Quote an identifier in the REMOTE database's dialect (backticks
    on MySQL, double quotes elsewhere) via Spark's own dialect registry;
    unquoted identifiers get case-folded by the database (Derby/Oracle
    upcase, Postgres downcases) and miss case-sensitive columns."""
    try:
        return (
            spark._jvm.org.apache.spark.sql.jdbc.JdbcDialects
            .get(url).quoteIdentifier(ident)
        )
    except Exception:  # noqa: BLE001 — ANSI fallback
        return '"' + ident.replace('"', '""') + '"'


def _compile_jdbc_incremental(
    spark: SparkSession, reader: dict[str, Any], writer: dict[str, Any]
):
    """DataX's bread-and-butter incremental RDBMS sync, executable end
    to end (tests/test_jdbc_sync.py drives it against embedded Derby):
    poll a source table's monotone numeric cursor column (autoincrement
    change-id / LSN — the column DataX jobs put in their templated
    ``where``), read only the span (last_cursor, pinned_hi], emit it as
    upsert change events (op from ``opColumn`` if the source keeps a
    soft op flag, else 'U'; lsn = cursor value), and hand it to the
    exactly-once ``icetable_merge`` sink.

    Exactly-once across crashes: the cursor file (kept in the TARGET
    table's metadata dir — single source of truth next to the commit
    ledger) advances only AFTER the write commits; a crash in between
    re-reads the same span, and replaying value-identical events
    through the LWW merge is a no-op by value. hi is pinned BEFORE the
    read so rows racing the job land after the pin and belong to the
    next span.

    Returns (df | None, advance_callable); None = empty span (nothing
    new — the job skips the writer entirely rather than committing an
    empty epoch).
    """
    import hashlib
    import json

    url = reader["jdbcUrl"]
    table = reader.get("connection", {}).get("table") or reader["table"]
    cur = reader["cursorColumn"]
    props = {
        k: str(v)
        for k, v in {
            "user": reader.get("username"),
            "password": reader.get("password"),
            "driver": reader.get("driver"),
            "fetchsize": reader.get("fetchSize"),
        }.items()
        if v is not None
    }
    name = reader.get("cursorName") or hashlib.md5(
        f"{url}|{table}|{cur}".encode()
    ).hexdigest()[:12]
    root = Path(writer["path"]) if writer.get("path") else None
    if reader.get("cursorPath"):
        state_file = Path(reader["cursorPath"])
    elif root is not None:
        state_file = root / "metadata" / f"sync-cursor-{name}.json"
    else:
        raise ValueError(
            "jdbc_incremental needs reader.cursorPath or a writer.path "
            "to keep the sync cursor in"
        )
    last = None
    if state_file.exists():
        last = json.loads(state_file.read_text())["cursor"]

    q = _quote_jdbc_ident(spark, url, cur)
    hi = spark.read.jdbc(
        url, f"(SELECT MAX({q}) AS dx_hi FROM {table}) dx_b", properties=props
    ).collect()[0][0]
    if hi is not None:
        try:
            hi_int = int(hi)
            if hi_int != hi:
                raise ValueError
        except (TypeError, ValueError):
            raise ValueError(
                f"jdbc_incremental cursorColumn {cur!r} must be an "
                f"INTEGER monotone change-id; got {hi!r} — fractional or "
                "non-numeric cursors would silently lose span rows; sync "
                "timestamp cursors through a numeric epoch column"
            ) from None
        hi = hi_int
    if hi is None or (last is not None and hi <= int(last)):
        return None, lambda: None  # empty span: nothing to do, no advance

    where = f"{q} <= {hi}"
    if last is not None:
        where += f" AND {q} > {int(last)}"
    if reader.get("where"):
        # the spec's own filter joins the span predicate INSIDE the
        # pushed-down subquery (DataX templates its where the same way)
        where += f" AND ({reader['where']})"
    span = f"(SELECT * FROM {table} WHERE {where}) dx_span"
    plan = JdbcReaderPlan(
        url,
        span,
        properties=props,
        partition_column=(cur if reader.get("numPartitions") else None),
        lower_bound=(int(last) + 1) if last is not None else None,
        upper_bound=hi,
        num_partitions=reader.get("numPartitions"),
    )
    df = plan.load(spark)
    if reader.get("column"):
        sel = list(reader["column"])
        if cur not in sel:
            sel.append(cur)  # the cursor must survive the projection
        if reader.get("opColumn") and reader["opColumn"] not in sel:
            sel.append(reader["opColumn"])
        df = df.select(*sel)
    if reader.get("opColumn"):
        op = F.col(reader["opColumn"])
    else:
        op = F.lit("U")
    df = df.withColumn("lsn", F.col(cur).cast("long")).withColumn("op", op)

    def advance() -> None:
        state_file.parent.mkdir(parents=True, exist_ok=True)
        tmp = state_file.with_name(state_file.name + ".tmp")
        tmp.write_text(json.dumps({"cursor": hi, "source": f"{url}|{table}"}))
        tmp.replace(state_file)

    return df, advance


def run_cdc_job(spark: SparkSession, spec: dict[str, Any]):
    """The engine's native job shape: change-tail reader → icetable
    MERGE writer, driven by the checkpointed epoch loop. Returns the
    EpochDriver (already run to the end of the available tail)."""
    from pyspark.sql import types as T

    from datax_spark.icetable.table import IceTable
    from datax_spark.streaming.driver import EpochDriver
    from datax_spark.streaming.source import ChangeTailSource

    reader = _resolve_catalog_path(spark, spec["reader"])
    writer = _resolve_catalog_path(spark, spec["writer"])
    if reader.get("type") != "change_tail" or writer.get("type") != "icetable":
        raise ValueError("cdc job needs reader.type=change_tail, writer.type=icetable")
    source = ChangeTailSource(spark, reader["path"])
    root = Path(writer["path"])
    if (root / "metadata" / "version-hint.text").exists():
        table = IceTable.load(spark, root)
    else:
        schema = T.StructType.fromJson(writer["schema"]) if isinstance(
            writer.get("schema"), dict
        ) else writer["schema"]
        table = IceTable.create(
            spark, root, schema, num_partitions=writer.get("numPartitions", 16)
        )
    settings = spec.get("settings", {})
    err = settings.get("errorLimit", {}).get("percentage")
    driver = EpochDriver(
        spark,
        source,
        table,
        spec["checkpoint"],
        shards_per_epoch=settings.get("speed", {}).get("shardsPerEpoch", 1),
        # DataX speed.record: hard per-epoch record bound (row offsets)
        records_per_epoch=settings.get("speed", {}).get("recordPerEpoch"),
        # DataX speed.byte: per-epoch byte bound (shard granular)
        bytes_per_epoch=settings.get("speed", {}).get("bytePerEpoch"),
        error_budget=err,
        merge_strategy=writer.get("mergeStrategy", "auto"),
        # collapse tracking-param/case/port URL variants onto one
        # canonical key before partitioning (functions/url.py spec)
        canonicalize_urls=reader.get("canonicalizeUrl", False),
        # writer.derived: "auto" maintains the table's REGISTERED
        # artifacts inside the loop (operators/derived.py) every
        # derivedSyncEvery epochs
        derived=writer.get("derived"),
        derived_sync_every=int(writer.get("derivedSyncEvery", 8)),
        ttl=writer.get("ttl"),
        compact_every=writer.get("compactEvery"),
        max_files_per_partition=writer.get("maxFilesPerPartition"),
        expire_keep_last=writer.get("expireKeepLast"),
    )
    driver.run()
    return driver
