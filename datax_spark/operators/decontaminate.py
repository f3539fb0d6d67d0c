"""Benchmark decontamination — drop training documents that overlap an
evaluation set (the standard n-gram leak check every LLM corpus runs
before training; cf. GPT-3 appendix C / PaLM §8, public methodology).

Shape for 100 TB: the benchmark side is tiny (eval suites are 10^3-10^5
documents), so its distinct n-gram set BROADCASTS; the corpus side is a
narrow (id, text) projection whose n-grams are generated and probed
inside one stage — the only shuffle is the per-doc hit count over the
(rare) matching grams, which is sized by the contamination, not the
corpus. No all-pairs anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datax_spark.functions.text import word_ngrams


def _grams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return (
        df.select(id_col, F.explode(word_ngrams(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Per-document contamination report vs a benchmark corpus:
    (id_col, n_hit_grams, contaminated) — ``n_hit_grams`` counts the
    DISTINCT benchmark n-grams the document contains; every input doc
    gets a row (0/false when clean). Documents shorter than ``n`` words
    have no n-grams and are clean by construction."""
    bench = (
        benchmark.select(F.explode(word_ngrams(F.col(bench_text_col), n)).alias("gram"))
        .distinct()
    )
    hits = (
        _grams(docs, id_col, text_col, n)
        .join(F.broadcast(bench), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit_grams"))
    )
    return docs.select(id_col).join(hits, id_col, "left").select(
        id_col,
        F.coalesce("n_hit_grams", F.lit(0)).cast("bigint").alias("n_hit_grams"),
        (F.coalesce("n_hit_grams", F.lit(0)) > 0).alias("contaminated"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Training docs with fewer than ``min_hits`` benchmark n-gram hits
    (anti-join form: the corpus never shuffles — only the flagged-id set,
    which broadcasts back)."""
    flagged = (
        ngram_contamination(docs, benchmark, n, id_col, text_col, bench_text_col)
        .filter(F.col("n_hit_grams") >= min_hits)
        .select(id_col)
    )
    return docs.join(F.broadcast(flagged), id_col, "left_anti")
