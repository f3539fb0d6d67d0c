"""SCD Type-2 dimension building from a CDC change log.

Turns a keyed change log (one row per observed state, ordered by a
timestamp/LSN) into the slowly-changing-dimension form every warehouse
sink of a CDC pipeline ultimately wants: one row per *state interval*
with ``valid_from`` / ``valid_to`` / ``is_current``, consecutive
identical states collapsed to a single interval.

Scale shape: both steps (run-collapse via ``lag``, interval close via
``lead``) are windows over the SAME (key, order) partitioning, so
Catalyst plans ONE hash exchange + one in-partition sort for the whole
build — the minimum any per-key ordered computation pays. No joins, no
self-join on adjacency.

Determinism: ordering is (order_col, tiebreak) — pass a unique
``tiebreak`` when order_col values can tie, or two equal-ts states pick
a partition-order-dependent run representative.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def scd2_from_log(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    attr_cols: Sequence[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """One row per maximal run of identical ``attr_cols`` per key:
    (key..., attrs..., valid_from, valid_to, is_current); ``valid_to``
    is the next run's start (half-open intervals), null on the current
    run."""
    keys = list(key_cols)
    attrs = list(attr_cols)
    order = [F.col(order_col).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)

    state = F.struct(*[F.col(c) for c in attrs])
    runs = (
        df.withColumn("__prev", F.lag(state).over(w))
        # eqNullSafe: a missing prev (run start) and null-valued attrs
        # both compare deterministically
        .where(~F.col("__prev").eqNullSafe(state))
        .drop("__prev")
    )
    # the run starts are a subset of the same partitioning — the second
    # window reuses the exchange
    out = (
        runs.withColumn("valid_from", F.col(order_col))
        .withColumn("valid_to", F.lead(order_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
    return out.select(*keys, *attrs, "valid_from", "valid_to", "is_current")


def scd2_lookup(
    dim: DataFrame,
    key_cols: Sequence[str],
    at,
) -> DataFrame:
    """The dimension as of time/LSN ``at`` — the point-in-time read an
    SCD2 table exists for: codegen interval filter, no shuffle."""
    keys = list(key_cols)
    at = F.lit(at)
    return dim.where(
        (F.col("valid_from") <= at)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > at))
    ).select(*dim.columns)
