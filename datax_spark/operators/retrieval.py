"""Keyword retrieval over the corpus — BM25 top-k (SURVEY.md §8:
training-data pipeline operators; the standard lexical scorer used for
query-based corpus curation, eval-set mining, and RAG-ish retrieval
baselines — Robertson/Sparck-Jones BM25, public methodology).

Shape for 100 TB: the QUERY side is tiny (10^2-10^5 query strings) —
its distinct term set broadcasts, and the corpus term explode is
semi-joined against it MAP-SIDE before the first shuffle, so the
(doc, term) aggregation carries only terms some query mentions, never
the corpus vocabulary. Document length rides the explode projection
(computed from the same token array), so no corpus-side self-join is
ever needed. Corpus-wide stats (N, avgdl) come from one narrow
aggregate cross-joined back as a broadcast literal row — the whole
plan is: one pruned corpus scan + one hit-sized shuffle + one
per-query top-k window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def _tokens(col):
    """Lowercased alnum tokens — frozen spec, mirrored by the DuckDB
    oracle (string_split_regex + list_filter)."""
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT), lambda t: t != "")


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """(query_id, doc_id, score, rank): the top ``k`` documents per
    query under BM25 with parameters ``k1``/``b``:

        score(q, d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
        idf(t)      = ln(1 + (N − df + 0.5) / (df + 0.5))

    A document scores only on terms it shares with the query; documents
    sharing no term are absent (score 0 rows are not emitted). Scores
    round to 4 decimals and ties break on ascending doc id, so the
    ranking is deterministic and oracle-comparable."""
    base = docs.select(F.col(id_col), _tokens(F.col(text_col)).alias("_toks"))
    # dl (total token count) rides the explode — no corpus self-join
    dterms = base.select(
        id_col, F.size("_toks").alias("dl"), F.explode("_toks").alias("term")
    )
    qterms = (
        queries.select(
            query_id_col, F.explode(_tokens(F.col(query_col))).alias("term")
        )
        .distinct()
    )
    needed = qterms.select("term").distinct()
    # map-side broadcast semi-join BEFORE the (doc, term) shuffle: the
    # aggregation sees only query-mentioned terms
    tf = (
        dterms.join(F.broadcast(needed), "term")
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = base.select(F.size("_toks").alias("dl")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        # exact integer sum / count (NOT F.avg's double accumulation):
        # one IEEE division over exact operands, bit-identical to the
        # persisted Bm25Index's meta-derived avgdl (sum_dl / n_docs)
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = df_t.crossJoin(F.broadcast(stats)).select(
        "term",
        F.log(
            F.lit(1.0) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
        "avgdl",
    )
    per_term = (
        tf.join(F.broadcast(idf), "term")
        .join(F.broadcast(qterms), "term")
        .select(
            query_id_col,
            id_col,
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("_s"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        per_term.groupBy(query_id_col, id_col)
        .agg(F.round(F.sum("_s"), 4).alias("score"))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "score", "rank")
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, term, score, rank): each document's top ``k`` terms by
    tf-idf — the keyword-profile / topic-fingerprint every curation
    report wants next to the quality scores.

        score(t, d) = tf(t, d) · ln(N / df(t))

    Shape: explode → one (doc, term) count shuffle; document
    frequencies are an aggregate OF that aggregate (vocabulary-sized,
    tiny vs the corpus) joined back on term; top-k is one per-doc
    window. Terms in every document (df == N) score exactly 0 and are
    kept — rank order stays deterministic via (score desc, term asc).
    Scores round to 4 decimals for cross-engine comparison."""
    base = docs.select(F.col(id_col), _tokens(F.col(text_col)).alias("_toks"))
    tf = (
        base.select(id_col, F.explode("_toks").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = docs.select(F.countDistinct(id_col).alias("n"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            (F.col("tf") * F.log(F.col("n") / F.col("df"))).alias("_s"),
        )
    )
    # rank on the ROUNDED score: a 1-ulp ln() difference between engines
    # must not flip the order — ties resolve by term
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.select(id_col, "term", F.round("_s", 4).alias("score"))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "score", "rank")
    )
