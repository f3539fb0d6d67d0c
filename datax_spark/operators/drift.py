"""Distribution drift between two populations: PSI (population
stability index) per category.

The CDC monitoring question: did the event mix / language mix / source
mix shift between two windows (yesterday's epochs vs today's, snapshot
v vs snapshot w)? PSI is the standard scorecard metric:

    PSI = Σ_c (p_c − q_c) · ln(p_c / q_c)

summed over categories c, with p the reference window's share and q the
current window's. Rule-of-thumb thresholds: <0.1 stable, 0.1–0.25
moderate shift, >0.25 population changed. Add-alpha smoothing keeps a
category that exists on only one side finite (the raw formula hits
ln(0)); alpha rides the category count so smoothing vanishes as data
grows.

Plan shape: one map-side-combined groupBy per side over (category),
then a |categories|-row full-outer join — the corpus rows are touched
exactly once per side, nothing wide shuffles. Deterministic: counts are
integers, shares and ln are IEEE doubles evaluated identically by any
engine, and the emitted values are rounded (6dp) at the boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def psi_by_category(
    ref: DataFrame,
    cur: DataFrame,
    category_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-category PSI terms between ``ref`` and ``cur``:
    (category, n_ref, n_cur, p_ref, q_cur, psi_term), ordered by
    category. ``sum(psi_term)`` is the PSI; per-category terms are
    emitted so the drilldown ("WHICH type drifted?") is the same query.
    Categories absent on one side appear with a zero count and a
    smoothed share."""
    a = ref.groupBy(F.col(category_col).alias("category")).agg(
        F.count(F.lit(1)).alias("n_ref")
    )
    b = cur.groupBy(F.col(category_col).alias("category")).agg(
        F.count(F.lit(1)).alias("n_cur")
    )
    j = (
        a.join(b, "category", "full_outer")
        .select(
            "category",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    # totals + category count as a 1-row broadcast: shares need global
    # denominators, computed from the already-tiny per-category frame
    tot = j.agg(
        F.sum("n_ref").alias("t_ref"),
        F.sum("n_cur").alias("t_cur"),
        F.count(F.lit(1)).alias("n_cat"),
    )
    p = (F.col("n_ref") + F.lit(alpha)) / (
        F.col("t_ref") + F.lit(alpha) * F.col("n_cat")
    )
    q = (F.col("n_cur") + F.lit(alpha)) / (
        F.col("t_cur") + F.lit(alpha) * F.col("n_cat")
    )
    return (
        j.crossJoin(F.broadcast(tot))
        .select(
            "category",
            "n_ref",
            "n_cur",
            F.round(p, 6).alias("p_ref"),
            F.round(q, 6).alias("q_cur"),
            F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
        )
        .orderBy("category")
    )


def psi_split(
    df: DataFrame,
    category_col: str,
    split_predicate: Column,
    alpha: float = 0.5,
) -> DataFrame:
    """PSI between the rows matching ``split_predicate`` (reference) and
    the rest (current) — the one-table form for "first half vs second
    half of the log"."""
    return psi_by_category(
        df.filter(split_predicate),
        df.filter(~split_predicate),
        category_col,
        alpha=alpha,
    )
