"""String-similarity self-join: all pairs within edit distance 1,
without the all-pairs cross join.

The deletion-neighborhood trick (public SymSpell methodology): for a
string s, let D(s) = {s} ∪ {s minus one character}. Two strings with
Levenshtein distance <= 1 ALWAYS share an element of their deletion
neighborhoods (substitution: both delete the differing position;
insertion/deletion: the longer string's deletion hits the shorter
string itself), so blocking on D(s) yields a candidate superset, and
one cheap exact ``levenshtein()`` verify on the candidates makes the
result exact.

Cost at scale: the explode fans each string out |s|+1 times — linear,
bounded by the key length (titles/urls/names, not documents) — and the
join is a hash EQUI-join on the neighborhood element. No quadratic
anything outside a shared block; a pathological block (thousands of
strings sharing one deletion) degrades to that block only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _neighborhood(col):
    """array of the string plus every single-character deletion."""
    s = F.col(col) if isinstance(col, str) else col
    dels = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(F.substring(s, 1, i - 1), s.substr(i + 1, F.length(s))),
    )
    return F.array_distinct(F.concat(F.array(s), dels))


def edit_distance_pairs(
    df: DataFrame, id_col: str, str_col: str
) -> DataFrame:
    """(id_a, id_b, dist) for every pair with levenshtein <= 1 and
    id_a < id_b — exact, via deletion-neighborhood blocking + verify.
    Identical strings count (dist 0)."""
    blocked = df.select(
        F.col(id_col).alias("_id"),
        F.col(str_col).alias("_s"),
        F.explode(_neighborhood(str_col)).alias("_d"),
    )
    a = blocked.select(
        F.col("_id").alias("id_a"), F.col("_s").alias("_sa"), "_d"
    )
    b = blocked.select(
        F.col("_id").alias("id_b"), F.col("_s").alias("_sb"), "_d"
    )
    cand = (
        a.join(b, "_d")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_sa", "_sb")
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("_sa", "_sb"))
        .where(F.col("dist") <= 1)
        .select("id_a", "id_b", F.col("dist").cast("bigint").alias("dist"))
    )
