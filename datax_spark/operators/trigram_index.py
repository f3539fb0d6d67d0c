"""Trigram substring index — accelerated ``LIKE '%...%'`` (pg_trgm /
Google Code Search style).

BM25 (operators/text_index) answers ranked KEYWORD queries; blooms
answer key membership; neither helps an arbitrary SUBSTRING predicate,
which at 100 TB is otherwise a full corpus scan per query. The trigram
index makes it: every document posts its distinct character 3-grams
once; a query needs ALL the pattern's 3-grams present, so candidates =
the AND-intersection of |pattern|-2 posting lists, then the exact
``contains`` verify touches candidates only. False positives possible
(grams present, order wrong) — the verify is mandatory; false
negatives impossible for patterns ≥ 3 chars (every substring occurrence
posts all its grams).

Scale shape: the index is ONE explode + distinct shuffle over the
corpus, O(total chars) postings partitioned by gram (hot grams spread
over files; a query reads only its grams' postings). A query is a
broadcast of ≤ |pattern| grams against the postings, one count-per-doc
aggregate bounded by the rarest gram's posting list, and a semi-join
back to the corpus for the verify — the corpus is never scanned.
Patterns shorter than 3 characters have no gram to prune on and fall
back to the scan, loudly (parameter, not surprise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm(col):
    return F.lower(col)


def trigram_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(gram, doc_id) — distinct lowercased character 3-grams per doc."""
    t = _norm(F.col(text_col))
    # guard: sequence(1, len-2) DESCENDS when len < 3 — short texts
    # must yield an empty gram array, not [1, 0]-indexed garbage
    idx = F.when(
        F.length(t) >= 3, F.sequence(F.lit(1), F.length(t) - 2)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: t.substr(i, F.lit(3)))
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("gram"))
        .distinct()
    )


def pattern_grams(pattern: str) -> list[str]:
    p = pattern.lower()
    return sorted({p[i : i + 3] for i in range(len(p) - 2)})


def like_search(
    docs: DataFrame,
    pattern: str,
    postings: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """doc_ids whose text contains ``pattern`` (case-insensitive).
    With ``postings`` the corpus is pruned through the index; without,
    or for patterns < 3 chars, it is the honest full scan."""
    contains = F.contains(_norm(F.col(text_col)), F.lit(pattern.lower()))
    grams = pattern_grams(pattern)
    if postings is None or not grams:
        return docs.filter(contains).select(F.col(id_col).alias("doc_id"))
    g = F.broadcast(
        docs.sparkSession.createDataFrame([(x,) for x in grams], "gram string")
    )
    cands = (
        postings.join(g, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") == len(grams))
        .select("doc_id")
    )
    # semi-join back for the verify; candidate set size rides the
    # rarest gram, so let AQE pick broadcast vs shuffle
    return (
        docs.join(cands, docs[id_col] == cands["doc_id"], "left_semi")
        .filter(contains)
        .select(F.col(id_col).alias("doc_id"))
    )
