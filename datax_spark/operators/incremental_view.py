"""Incremental materialized-view maintenance from the table changelog.

The point of a change-data-feed is that downstream aggregates should
NOT be recomputed from scratch on every source commit. This module
maintains a grouped sum/count view (the materialized-aggregate shape:
per-language corpus profiles, per-source token budgets, per-partition
lineage stats) from ``IceTable.read_changes(pre_images=True)`` deltas:

    view(v2) == maintain_agg_view(view(v1), changes(v1, v2))

for ANY pair of retained versions — proven differentially in
tests/test_incremental_view.py against the full recompute, including
updates that MOVE a row between groups (the case that makes pre-images
mandatory: the UB row decrements the old group, the UA row increments
the new one).

Scale shape: the delta aggregation is one map-side-combined pass over
the CHANGE batch (churn-sized, not table-sized); the merge is a join on
group keys between two |groups|-row relations, with the delta side
broadcast when small. A 100 TB table with 10^4 groups and 10^6 changed
rows per commit maintains its rollup by shuffling ~10^4 rows — the full
recompute it replaces would re-scan the table. min/max are deliberately
NOT offered: they are not incrementally maintainable under deletes
without keeping per-group heaps; use a periodic full refresh for those.

Supported measures: row count (``n_rows``) and ``SUM`` over numeric
columns. Each sum carries a non-null-value count (``nn_<c>``) so the
SQL identity "SUM over zero non-null values is NULL" survives deletes
that drain a group to all-NULL measures — without it, an incrementally
maintained sum decays to 0 where the recompute says NULL. Groups whose
maintained row count reaches zero are REMOVED, so the maintained
relation is always exactly what a fresh GROUP BY produces.

Exactness: integral/decimal measures maintain bit-exactly. Floating
point sums are subject to the usual (a+b)-b ≠ a rounding drift under
long delete chains; at scale, prefer decimal measures or periodic
refresh anchoring (the CDC driver's epoch cadence makes the refresh a
natural maintenance action).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

#: ops carried by a pre-image changelog and their contribution sign.
_PLUS = ("I", "UA")
_MINUS = ("D", "UB")


def agg_view(
    df: DataFrame, group_cols: Sequence[str], sum_cols: Sequence[str]
) -> DataFrame:
    """Full recompute of the maintained view: one grouped aggregate.

    Columns: ``group_cols…, n_rows, sum_<c>…, nn_<c>…`` — the exact
    schema ``maintain_agg_view`` preserves, so refresh-from-scratch and
    incremental maintenance are interchangeable."""
    return df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
        *[F.count(c).alias(f"nn_{c}") for c in sum_cols],
    )


def changes_delta(
    changes: DataFrame, group_cols: Sequence[str], sum_cols: Sequence[str]
) -> DataFrame:
    """Per-group net delta of a pre-image change batch.

    Plain two-op feeds (a bare ``U`` with only the post-image) cannot
    maintain sums — the pre-image's contribution is unknown — so a
    stray U row fails the job loudly instead of corrupting the view.
    """
    sign = (
        F.when(F.col("_op").isin(*_PLUS), F.lit(1))
        .when(F.col("_op").isin(*_MINUS), F.lit(-1))
        .otherwise(
            F.expr(
                "raise_error('incremental_view: changelog op without "
                "pre-images (need read_changes(pre_images=True))')"
            ).cast("int")
        )
    )
    return changes.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.sum(sign).alias("_d_n"),
        *[
            # sign * NULL is NULL and SUM skips it — same null algebra
            # as the recompute's SUM over the raw rows.
            F.sum(sign * F.col(c)).alias(f"_d_{c}")
            for c in sum_cols
        ],
        *[
            F.sum(
                F.when(F.col(c).isNotNull(), sign).otherwise(F.lit(0))
            ).alias(f"_dnn_{c}")
            for c in sum_cols
        ],
    )


def maintain_agg_view(
    view: DataFrame,
    changes: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
) -> DataFrame:
    """Apply a ``read_changes(pre_images=True)`` batch to a view built
    by :func:`agg_view`, returning the maintained view.

    Null group keys are legal groups (SQL GROUP BY keeps them), so the
    merge joins with null-safe equality — a plain equi-join would
    duplicate the NULL group on both sides. The merge is a FULL OUTER
    join (new groups appear, drained groups must surface to be
    dropped), which Spark cannot broadcast — so it sort-merges on the
    group key. Both sides are |groups|-sized relations, never the fact
    table, so the exchange is the cheap part of the plan by
    construction."""
    delta = changes_delta(changes, group_cols, sum_cols)
    v = view.alias("v")
    d = delta.alias("d")
    cond = None
    for c in group_cols:
        t = F.col(f"v.{c}").eqNullSafe(F.col(f"d.{c}"))
        cond = t if cond is None else cond & t
    merged = v.join(d, cond, "full_outer")
    n = F.coalesce(F.col("v.n_rows"), F.lit(0)) + F.coalesce(
        F.col("d._d_n"), F.lit(0)
    )
    cols = []
    for c in sum_cols:
        nn = F.coalesce(F.col(f"v.nn_{c}"), F.lit(0)) + F.coalesce(
            F.col(f"d._dnn_{c}"), F.lit(0)
        )
        # SUM over zero non-null values is NULL, not 0 — the nn counter
        # is what lets a delete-drained group recover that identity.
        s = F.when(nn == 0, F.lit(None)).otherwise(
            F.coalesce(F.col(f"v.sum_{c}"), F.lit(0))
            + F.coalesce(F.col(f"d._d_{c}"), F.lit(0))
        )
        cols.append((s.alias(f"sum_{c}"), nn.alias(f"nn_{c}")))
    return merged.select(
        *[F.coalesce(F.col(f"v.{c}"), F.col(f"d.{c}")).alias(c) for c in group_cols],
        n.alias("n_rows"),
        *[s for s, _ in cols],
        *[nn for _, nn in cols],
    ).filter(F.col("n_rows") > 0)
