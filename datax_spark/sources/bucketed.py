"""Bucketed tables — co-located joins and aggregations without a
shuffle.

At 100 TB the dominant cost of a repeated key-join (fact-to-fact CDC
reconciliation, daily snapshot diff, dedup-against-yesterday) is the
exchange of BOTH sides on every run. Spark's hive-style bucketing pays
that exchange ONCE at write time: ``bucketBy(n, key)`` hashes rows into
a fixed bucket layout, and every later equi-join or groupBy on the key
between tables with the same bucket spec runs exchange-free (asserted
in tests/test_bucketing.py — zero Exchange operators in the joined
plan). With matched ``sortBy`` the merge-join Sort is elided too, but
only under ``spark.sql.legacy.bucketedTableScan.outputOrdering=true``
(gated since SPARK-28169) AND one file per bucket — which
``write_bucketed`` guarantees via a layout-aligned pre-repartition.

The bucket count is the table's permanent parallelism for co-located
work: pick it from target-cluster cores at expected size (e.g. 4096
for a 1000-executor corpus), not from today's input.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-local) managed
    table. One exchange now; none on every future key-join/agg.

    The pre-write ``repartition(n_buckets, keys)`` uses the same
    murmur3 hash as the bucket layout, so every bucket lands in exactly
    ONE file — the condition under which Spark's reader also elides the
    merge-join Sort (multiple files per bucket force a re-sort even
    when ``sortBy`` matches)."""
    keys = list(key_cols)
    df = df.repartition(n_buckets, *keys)
    w = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *keys)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables that share a bucket spec on ``on``. The plan
    must contain no Exchange; callers relying on that should assert it
    (a mismatched bucket count silently reintroduces the shuffle)."""
    return spark.table(left_table).join(
        spark.table(right_table), list(on), how
    )
