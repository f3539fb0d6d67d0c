"""Multi-resolution time rollup (continuous-aggregate / hypertable shape).

Monitoring and training-data telemetry want the same aggregate at
several grains at once — per-minute for alerting, per-hour for
dashboards, per-day for capacity. The naive form runs one full scan per
grain; the union-of-cascades form still *plans* one subtree per grain
and Catalyst does not reliably share them (measured: AQE left the raw
scan duplicated per branch). This operator instead scans raw data ONCE
into the finest grain, then EXPLODES each finest-grain partial into its
(grain, bucket) memberships and re-aggregates all levels in one job:

    raw (N rows) ── scan+agg ──▶ finest partials (M rows, M ≪ N)
    partials × |grains| ── explode ──▶ one groupBy(resolution, bucket)

Exactly ONE raw scan and TWO exchanges regardless of grain count
(plan-asserted in tests/test_rollup_time.py). The exploded relation is
|grains| × M rows of partials — a rounding error next to the raw scan
at 100 TB, where M is bounded by (time range × groups), independent of
row count. All measures are algebraic so partials compose losslessly:
count→sum, sum→sum, min→min, max→max. AVG is intentionally derived
(sum/count) downstream rather than averaged-of-averages, which would be
wrong under uneven bucket fills.

Output: one DataFrame with a ``resolution`` label column and the bucket
start (``bucket_ts``), so a single sink table serves every grain (the
TimescaleDB continuous-aggregate layout).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

#: supported grains, finest → coarsest; each truncates the previous.
_GRAIN_ORDER = ("minute", "hour", "day", "week", "month", "year")


def time_rollup(
    df: DataFrame,
    ts_col: str,
    group_cols: Sequence[str],
    value_col: str,
    resolutions: Sequence[str] = ("minute", "hour", "day"),
) -> DataFrame:
    """One-scan multi-grain rollup of ``value_col`` by ``group_cols``.

    ``resolutions`` must be drawn from minute/hour/day/week/month/year.
    Measures per bucket: ``n`` (row count), ``sum_value``, ``min_value``,
    ``max_value`` — the algebraic set that re-aggregates losslessly
    across grains (count of counts is a sum; min of mins is a min)."""
    grains = sorted(set(resolutions), key=_GRAIN_ORDER.index)
    if not grains:
        raise ValueError("time_rollup: need at least one resolution")
    finest = grains[0]

    level = df.groupBy(
        F.date_trunc(finest, F.col(ts_col)).alias("_fine_ts"),
        *[F.col(c) for c in group_cols],
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value_col).alias("sum_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )

    # each finest partial belongs to exactly one bucket per grain —
    # explode the membership list and merge every level in one groupBy
    memberships = F.array(
        *[
            F.struct(
                F.lit(g).alias("resolution"),
                F.date_trunc(g, F.col("_fine_ts")).alias("bucket_ts"),
            )
            for g in grains
        ]
    )
    exploded = level.select(
        F.explode(memberships).alias("_m"),
        *[F.col(c) for c in group_cols],
        "n",
        "sum_value",
        "min_value",
        "max_value",
    )
    return (
        exploded.groupBy(
            F.col("_m.resolution").alias("resolution"),
            F.col("_m.bucket_ts").alias("bucket_ts"),
            *[F.col(c) for c in group_cols],
        )
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        .select(
            "resolution", "bucket_ts", *group_cols,
            "n", "sum_value", "min_value", "max_value",
        )
    )
