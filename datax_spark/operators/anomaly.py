"""Groupwise anomaly flagging over an event stream.

The monitoring half every ingest pipeline grows: given a numeric
measure and a grouping (event type, source, partition), flag the rows
that sit far outside their group's distribution. Two detectors:

- ``zscore_outliers``: classic k-sigma — flag |value - mean| > k*stddev
  within each group. Cheap and familiar; assumes roughly unimodal data.
- ``iqr_outliers``: Tukey fences on exact quartiles — robust to the
  heavy tails that break the sigma rule (a single 10^9 outlier inflates
  stddev until nothing else flags).

Scale shape (both): the per-group statistics are ONE map-side-combined
aggregate whose result has |groups| rows — tiny — and are joined back
with an explicit ``broadcast()``. The event table itself never
shuffles; the flag test is a codegen projection. At 100 TB this is a
single pass over the data plus an O(|groups|) broadcast, with no wide
exchange on the fact table.

Determinism: statistics use sample stddev (Spark ``stddev`` ==
DuckDB ``stddev_samp``) and exact linear-interpolation percentiles
(Spark ``percentile`` == DuckDB ``quantile_cont``), so an external SQL
oracle reproduces the flags bit-for-bit at 4 dp.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def _with_stats(df: DataFrame, stats: DataFrame, gc: list) -> DataFrame:
    # empty group list = global statistics: a one-row broadcast
    # crossJoin, not an empty-key equi-join
    if gc:
        return df.join(F.broadcast(stats), gc)
    return df.crossJoin(F.broadcast(stats))


def zscore_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    k: float = 3.0,
) -> DataFrame:
    """Rows where |value - group mean| > k * group sample-stddev.

    Adds ``z`` (signed z-score, 4 dp). Groups with zero variance (or a
    single row, where sample stddev is NULL) flag nothing.
    """
    gc = list(group_cols)
    stats = df.groupBy(*gc).agg(
        F.avg(value_col).alias("_mu"),
        F.stddev(value_col).alias("_sigma"),
    )
    z = (F.col(value_col) - F.col("_mu")) / F.col("_sigma")
    return (
        _with_stats(df, stats, gc)
        .where(F.col("_sigma") > 0)
        .where(F.abs(z) > F.lit(float(k)))
        .withColumn("z", F.round(z, 4))
        .drop("_mu", "_sigma")
    )


def zscore_inliers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    k: float = 3.0,
) -> DataFrame:
    """The complement filter, same columns as ``df``: keep rows within
    k sigma of their group mean (rows of zero-variance/singleton groups
    are kept — nothing is anomalous where nothing varies). Same plan
    shape: broadcast stats + codegen predicate, no fact shuffle."""
    gc = list(group_cols)
    stats = df.groupBy(*gc).agg(
        F.avg(value_col).alias("_mu"),
        F.stddev(value_col).alias("_sigma"),
    )
    z = (F.col(value_col) - F.col("_mu")) / F.col("_sigma")
    keep = (
        F.col("_sigma").isNull()
        | (F.col("_sigma") == 0)
        | (F.abs(z) <= F.lit(float(k)))
    )
    return (
        _with_stats(df, stats, gc)
        .where(keep)
        .drop("_mu", "_sigma")
        .select(*df.columns)
    )


def iqr_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    k: float = 1.5,
) -> DataFrame:
    """Rows outside the Tukey fences [q1 - k*iqr, q3 + k*iqr] of their
    group. Adds ``fence_lo``/``fence_hi`` (4 dp). Exact quartiles with
    linear interpolation; groups where iqr == 0 flag every off-median
    row, which is the standard fence semantics."""
    gc = list(group_cols)
    q = F.percentile(value_col, [0.25, 0.75])
    stats = df.groupBy(*gc).agg(q[0].alias("_q1"), q[1].alias("_q3"))
    iqr = F.col("_q3") - F.col("_q1")
    lo = F.col("_q1") - F.lit(float(k)) * iqr
    hi = F.col("_q3") + F.lit(float(k)) * iqr
    return (
        _with_stats(df, stats, gc)
        .where((F.col(value_col) < lo) | (F.col(value_col) > hi))
        .withColumn("fence_lo", F.round(lo, 4))
        .withColumn("fence_hi", F.round(hi, 4))
        .drop("_q1", "_q3")
    )
