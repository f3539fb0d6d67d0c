"""SparkSession factory with scale-aware defaults.

Local mode stands in for a multi-executor cluster in this sandbox; the
configs below are the ones that matter at both scales:

* AQE on — runtime coalescing, skew-join splitting, broadcast demotion.
* ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster this should be ~2-3× total executor cores (or left to AQE's
  coalescing with a high initial value).
* UTC session timezone — bit-for-bit replay equivalence and DuckDB-oracle
  comparability both require a pinned timezone.
* Arrow enabled — pandas UDFs and createDataFrame(pandas) take the
  vectorized path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "datax_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("DATAX_SPARK_MASTER", "local[*]")
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 8
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # int64 micros, not legacy INT96: the Iceberg spec's timestamp
        # physical type, and the only form that carries parquet footer
        # min/max statistics (IceTable's per-file column envelopes need
        # them to file-skip on warc_ts predicates)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # IceTable scans pass explicit LEAF-FILE paths (the pruned file
        # set), never directories to recurse — above this threshold Spark
        # schedules a distributed listing JOB per relation, a full
        # job round-trip (~0.4s here) paid on every pruned scan of every
        # epoch. Driver-side listing of explicit files is one stat()
        # each: strictly cheaper on POSIX metadata and still fine on an
        # object store at bounded live-file counts (compaction's
        # file-count trigger is what bounds them). Lower this only for
        # huge directory-recursive scans on slow object stores.
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "100000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("DATAX_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
