"""Heavy hitters — corpus-wide top-k frequent tokens.

Two paths with the same answer and very different 100-TB cost:

- ``top_tokens_exact``: explode → one map-side-combined count on the
  term. Correct always; the shuffle carries the full VOCABULARY
  (fine for natural-language vocab, hostile for open token domains:
  URLs, n-grams, user ids).
- ``top_tokens_candidates``: per-partition Misra-Gries summaries with
  ``m`` counters (bounded memory regardless of partition vocabulary,
  classic streaming-frequency guarantee: any term with global count
  > total/m survives in some summary), candidates unioned (≤ m ×
  partitions rows — tiny), then ONE exact recount restricted to the
  broadcast candidate set. The corpus shuffles only candidate-term
  rows; the open domain never does. Exactness condition: the true
  k-th count must exceed total_tokens/m — pick ``m >> k`` (the default
  64× headroom) and the recount makes the final counts exact, so the
  two paths agree bit-for-bit (differential-tested).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from datax_spark.operators.retrieval import _tokens


def _top_k(counts: DataFrame, k: int) -> DataFrame:
    w = Window.orderBy(F.col("n").desc(), F.col("term").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("term", "n", "rank")
    )


def top_tokens_exact(
    docs: DataFrame, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """(term, n, rank): exact global top-k, ties broken on term asc.
    The final total-order window sees only the pre-aggregated
    vocabulary, never corpus rows."""
    counts = (
        docs.select(F.explode(_tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return _top_k(counts, k)


def top_tokens_candidates(
    docs: DataFrame, k: int = 20, m: int | None = None, text_col: str = "text"
) -> DataFrame:
    """Same output as ``top_tokens_exact`` whenever the k-th most
    frequent term's count exceeds total_tokens/m (guaranteed by the
    Misra-Gries summary); memory per task is O(m) counters no matter
    how large the partition's vocabulary is."""
    m = m or 64 * k

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for toks in pdf["toks"]:
                for t in toks:
                    if t in counters:
                        counters[t] += 1
                    elif len(counters) < m:
                        counters[t] = 1
                    else:
                        # decrement-all step; drop zeros
                        dead = []
                        for key in counters:
                            counters[key] -= 1
                            if counters[key] == 0:
                                dead.append(key)
                        for key in dead:
                            del counters[key]
        yield pd.DataFrame({"term": list(counters.keys())})

    toks = docs.select(_tokens(F.col(text_col)).alias("toks"))
    cands = toks.mapInPandas(mg, "term string").select("term").distinct()
    exact = (
        docs.select(F.explode(_tokens(F.col(text_col))).alias("term"))
        .join(F.broadcast(cands), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return _top_k(exact, k)
