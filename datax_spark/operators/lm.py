"""Bigram language-model quality scoring — the perplexity-filter stage
of CCNet/Llama-style pipelines (there, a KenLM 5-gram; here, the same
computation as a distributed bigram LM with add-k smoothing, so the
whole train+score path is DataFrame ops with a DuckDB-replayable
oracle — no LM binary required).

Train (one pass over the corpus):
    c(l, r)  — adjacent-token bigram counts   (one groupBy)
    c(l)     — left-context counts            (folds from the same explode)
    V        — vocab size (distinct tokens)

Score (per document):
    p(r | l) = (c(l,r) + k) / (c(l) + k·V)
    score    = mean over the doc's bigrams of ln p   (≤ 0; higher = more
               fluent under the corpus model); docs with < 2 tokens
               score 0 (no evidence).

Scale shape: the bigram-count table is vocab²-bounded but Zipf-sparse
(~1e8-1e9 rows at web scale) — the score join is an equi-join keyed on
the bigram, shuffled once on each side, never all-pairs; counts fold
map-side before the shuffle. For a trimmed model (top-N bigrams) the
count table broadcasts and the corpus never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, l, r) — one row per adjacent token pair per document."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "\\s+", -1), lambda t: t != ""
    )
    n = F.greatest(F.size(toks) - 1, F.lit(0))  # 0-token docs: no slice
    pairs = F.arrays_zip(F.slice(toks, 1, n), F.slice(toks, 2, n))
    return df.select(
        F.col(id_col), F.explode(pairs).alias("p")
    ).select(
        id_col, F.col("p")["0"].alias("l"), F.col("p")["1"].alias("r")
    )


def train_bigram_lm(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """(bigram_counts(l, r, n_lr), context_counts(l, n_l), vocab_size)."""
    bg = _doc_bigrams(corpus, id_col, text_col)
    bigrams = bg.groupBy("l", "r").agg(F.count(F.lit(1)).alias("n_lr"))
    contexts = bigrams.groupBy("l").agg(F.sum("n_lr").alias("n_l"))
    toks = corpus.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "\\s+", -1),
                lambda t: t != "",
            )
        ).alias("t")
    )
    vocab = toks.select("t").distinct().count()
    return bigrams, contexts, vocab


def lm_score(
    docs: DataFrame,
    bigrams: DataFrame,
    contexts: DataFrame,
    vocab: int,
    k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, lm_score, n_bigrams) — mean ln p(r|l), add-k smoothed.
    Unseen bigrams/contexts fall back to the smoothing mass."""
    bg = _doc_bigrams(docs, id_col, text_col)
    joined = (
        bg.join(bigrams, ["l", "r"], "left")
        .join(contexts, ["l"], "left")
        .select(
            id_col,
            F.log(
                (F.coalesce(F.col("n_lr"), F.lit(0)) + F.lit(k))
                / (F.coalesce(F.col("n_l"), F.lit(0)) + F.lit(k * vocab))
            ).alias("lp"),
        )
    )
    scored = joined.groupBy(id_col).agg(
        F.round(F.avg("lp"), 4).alias("lm_score"),
        F.count(F.lit(1)).alias("n_bigrams"),
    )
    # docs with < 2 tokens have no bigrams: score 0, count 0
    return (
        docs.select(id_col)
        .join(scored, [id_col], "left")
        .select(
            id_col,
            F.coalesce(F.col("lm_score"), F.lit(0.0)).alias("lm_score"),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
        )
    )


def perplexity_filter(
    corpus: DataFrame,
    threshold: float,
    k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Self-scored corpus gate: train on the corpus, keep docs whose
    mean ln p clears the threshold (CCNet keeps the low-perplexity
    head). Returns docs + lm_score."""
    bigrams, contexts, vocab = train_bigram_lm(corpus, id_col, text_col)
    scores = lm_score(corpus, bigrams, contexts, vocab, k, id_col, text_col)
    return corpus.join(scores, [id_col]).filter(
        F.col("lm_score") >= threshold
    )
