"""Mergeable distinct-count sketch: KMV (k minimum values).

The 100-TB cardinality question ("how many distinct normalized pages /
urls are in this corpus?") cannot afford an exact count-distinct: the
shuffle carries every distinct value. A KMV sketch answers it with k
hashes per PARTITION flowing to the driver: hash every value to a
uniform point in [0,1), keep the k smallest distinct hashes; if the
k-th smallest lands at fraction f of the hash space, the space holds
about (k-1)/f distinct values (the classic order-statistics estimator,
Bar-Yossef et al. 2002 / Beyer et al. 2007 "On synopses for distinct-
value estimation"). Standard error ~ 1/sqrt(k-2): k=256 → ~6%.

Why not Spark's approx_count_distinct: that HLL++ is correct but its
binary sketch is engine-private — no other system reproduces its
estimate, so a cross-engine contract (this repo's DuckDB oracle, or a
consumer re-checking corpus accounting) cannot verify it. KMV over md5
is engine-neutral BY VALUE: any system that can md5 and sort strings
reproduces the exact same k hashes and the exact same estimate —
determinism is the feature, like the md5-gate sampling operators.

Merge property (what makes it a sketch, not a sample): the k smallest
of a union is computable from each part's k smallest — Spark's
TakeOrdered does exactly that per partition, so the plan is a map-side
distinct + per-partition top-k with only k rows per partition reaching
the driver. Persisting the k hashes gives an incrementally mergeable
corpus-cardinality ledger across epochs (union of sketches = sketch of
union).

Fraction from a hex hash: the first 13 hex digits are 52 bits — exact
in an IEEE double — so f = int(hex[:13], 16) / 16^13 is bit-identical
in every engine that parses hex (Spark `conv`, DuckDB `('0x'||h)::
BIGINT`, python `int(h, 16)`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16^13 = 2^52: largest hex-digit count whose value is exact in a double
_HEX_DIGITS = 13
_HEX_SPACE = float(1 << (4 * _HEX_DIGITS))


def hash_fraction(h: Column) -> Column:
    """Uniform [0,1) position of a lowercase hex hash string (first 13
    digits, exact in a double — see module docstring)."""
    return F.conv(F.substring(h, 1, _HEX_DIGITS), 16, 10).cast("double") / F.lit(
        _HEX_SPACE
    )


def kmv_sketch(df: DataFrame, col, k: int = 256) -> DataFrame:
    """The k smallest distinct md5 hashes of ``col`` — the sketch itself,
    one narrow k-row frame. Mergeable: ``kmv_sketch(a.union(b))`` ≡
    re-sketching ``sketch_a.union(sketch_b)`` (min-k of a union is the
    min-k of the parts' min-k's)."""
    h = F.md5(F.col(col) if isinstance(col, str) else col)
    return df.select(h.alias("h")).distinct().orderBy("h").limit(k)


def kmv_estimate(sketch: DataFrame, k: int) -> DataFrame:
    """Fold a sketch to one row: (k, k_rows, kth_hash, est_distinct).
    With fewer than k distinct values the sketch IS the value set and
    the count is exact; otherwise (k-1)/f(kth). Rounded to 4dp so every
    engine agrees at the emitted precision."""
    return sketch.agg(
        F.lit(k).alias("k"),
        F.count(F.lit(1)).alias("k_rows"),
        F.max("h").alias("kth_hash"),
    ).select(
        "k",
        "k_rows",
        "kth_hash",
        F.round(
            F.when(F.col("k_rows") < k, F.col("k_rows").cast("double")).otherwise(
                F.lit(float(k - 1)) / hash_fraction(F.col("kth_hash"))
            ),
            4,
        ).alias("est_distinct"),
    )


def kmv_distinct(df: DataFrame, col, k: int = 256) -> DataFrame:
    """One-shot estimate: sketch + fold."""
    return kmv_estimate(kmv_sketch(df, col, k), k)
