"""Pipeline health report over the lineage/metrics table — the ops
dashboard query for a running CDC ingest (SURVEY §2: per-partition
lineage is emitted as a metrics table; this is the consumer).

One narrow scan of lineage (O(epochs · partitions) rows — metadata
scale, not data scale) folded to one row per epoch with the health
signals an on-call actually pages on:

* throughput (rows/sec from rows_in and the slowest partition's wall),
* dirty ratio + a z-score flag against the trailing window (a dirty
  SPIKE is the "upstream schema broke" page),
* LSN watermark advance (a non-advancing watermark = stuck source;
  a regressing one = replay/ordering bug),
* ledger integrity: epochs committed in the table but missing lineage
  rows, or vice versa (crash between commit and metrics write).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datax_spark.icetable.table import IceTable


def pipeline_report(table: IceTable, spike_window: int = 8) -> DataFrame:
    """Per-epoch health rows: (epoch, n_partitions, rows_in,
    rows_upserted, rows_deleted, rows_dirty, dirty_ratio, wall_ms,
    rows_per_sec, lsn_watermark, watermark_advanced, dirty_zscore,
    dirty_spike, in_ledger). Ordered by epoch."""
    lin = table.read_lineage()
    per_epoch = lin.groupBy(F.col("checkpoint_epoch").alias("epoch")).agg(
        F.count(F.lit(1)).alias("n_partitions"),
        F.sum("rows_in").alias("rows_in"),
        F.sum("rows_upserted").alias("rows_upserted"),
        F.sum("rows_deleted").alias("rows_deleted"),
        F.sum("rows_dirty").alias("rows_dirty"),
        # partitions run in parallel: epoch wall = slowest partition
        F.max("wall_ms").alias("wall_ms"),
        F.max("lsn_watermark").alias("lsn_watermark"),
    )
    w = Window.orderBy("epoch")
    trail = w.rowsBetween(-spike_window, -1)
    dirty_ratio = F.when(
        F.col("rows_in") > 0, F.col("rows_dirty") / F.col("rows_in")
    ).otherwise(F.lit(0.0))
    scored = (
        per_epoch.withColumn("dirty_ratio", F.round(dirty_ratio, 6))
        .withColumn(
            "rows_per_sec",
            F.round(
                F.when(
                    F.col("wall_ms") > 0,
                    F.col("rows_in") * 1000.0 / F.col("wall_ms"),
                ),
                2,
            ),
        )
        .withColumn(
            "watermark_advanced",
            F.coalesce(
                F.col("lsn_watermark") > F.lag("lsn_watermark").over(w),
                F.lit(True),  # first epoch
            ),
        )
        .withColumn("_mu", F.avg("dirty_ratio").over(trail))
        .withColumn("_sd", F.stddev_samp("dirty_ratio").over(trail))
        .withColumn(
            "dirty_zscore",
            F.when(
                F.col("_sd").isNotNull() & (F.col("_sd") > 0),
                F.round((F.col("dirty_ratio") - F.col("_mu")) / F.col("_sd"), 3),
            ),
        )
        .withColumn(
            "dirty_spike",
            F.coalesce(F.col("dirty_zscore") > 3.0, F.lit(False)),
        )
        .drop("_mu", "_sd")
    )
    # ledger round-trip: both sides are driver-known metadata (the
    # ledger lives in table metadata; epochs number O(retention))
    committed = sorted(table.committed_epochs())
    ledger = table.spark.createDataFrame(
        [(int(e),) for e in committed] or [], "epoch long"
    ).withColumn("in_ledger", F.lit(True))
    return (
        scored.join(ledger, "epoch", "full_outer")
        .select(
            "epoch",
            "n_partitions",
            "rows_in",
            "rows_upserted",
            "rows_deleted",
            "rows_dirty",
            "dirty_ratio",
            "wall_ms",
            "rows_per_sec",
            "lsn_watermark",
            "watermark_advanced",
            "dirty_zscore",
            "dirty_spike",
            F.coalesce("in_ledger", F.lit(False)).alias("in_ledger"),
        )
        .orderBy("epoch")
    )


def report_anomalies(report: DataFrame) -> DataFrame:
    """Filter a pipeline_report to the rows an alert should fire on:
    dirty spikes, stalled watermarks, ledger/lineage mismatches
    (lineage without ledger entry = metrics for an uncommitted epoch;
    ledger without lineage = commit landed but metrics were lost)."""
    return report.filter(
        F.col("dirty_spike")
        | ~F.col("watermark_advanced")
        | ~F.col("in_ledger")
        | F.col("rows_in").isNull()
    )
