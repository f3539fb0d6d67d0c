"""DSIR-style importance resampling — select raw-corpus documents that
look like a target corpus (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling"), as pure DataFrame ops.

The published recipe: featurize every document as a hashed bag of
unigrams+bigrams, fit two smoothed categorical distributions over the
hash buckets (target corpus vs raw corpus), weight each raw document by
its log importance ratio  sum_g count_g * (ln p_target(g) - ln p_raw(g)),
then sample the selection set with Gumbel-top-k (sampling without
replacement proportional to the importance weights).

Spark shape (designed for a 100-TB raw corpus):

- Featurization is pure codegen: tokens via one ``split``, bigrams via
  ``zip_with`` against the shifted array, buckets via the md5-prefix
  integer (the same cross-engine hash as ``functions/classifier.py`` /
  ``operators/sampling.py``) — no Python anywhere.
- Each distribution is ONE map-side-combined groupBy whose output is at
  most ``n_buckets`` rows (corpus-size independent); the two totals fold
  in as broadcast scalars (the BM25 pattern), so the log-ratio table is
  a <=n_buckets-row DataFrame that BROADCASTS onto the raw corpus.
- Per-document weights cost one explode + broadcast join + one
  groupBy(id) with map-side partial aggregation — the only raw-corpus
  shuffle, carrying one narrow row per (doc, task).
- Selection is ``orderBy(score desc, id).limit(n)`` → TakeOrdered (a
  per-partition top-n + driver merge of n rows, never a global sort).
  Gumbel noise is md5-derived — deterministic, replay-stable, and
  reproducible in the driver's DuckDB oracle; scores are rounded before
  ranking so ln() ulp noise cannot flip cross-engine order (the
  tfidf_top_terms rule).

No n-gram strings ever shuffle: documents reduce to bucket ids
immediately, and only (bucket, count) rows and per-doc scalars move.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ws_tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), "\\s+", -1), lambda t: t != "")


def _bucket(s: Column, n_buckets: int, seed: str) -> Column:
    """Deterministic string → [0, n_buckets) md5-prefix bucket, identical
    in DuckDB as CAST('0x' || substr(md5(seed || s), 1, 8) AS BIGINT) % B."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed), s)), 1, 8), 16, 10
    ).cast("bigint")
    return h % n_buckets


def hashed_ngram_buckets(
    text: Column, n_buckets: int = 1024, seed: str = "dsir"
) -> Column:
    """array<bigint> of hashed unigram+bigram bucket ids (one entry per
    OCCURRENCE — DSIR counts a multiset, not a set)."""
    toks = _ws_tokens(text)
    # bigrams: pair each token with its successor; the final (tok, null)
    # pair concats to null and is filtered out. Empty/1-token docs yield [].
    tail = F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))
    bis = F.filter(
        F.zip_with(toks, tail, lambda a, b: F.concat(a, F.lit(" "), b)),
        lambda g: g.isNotNull(),
    )
    grams = F.concat(toks, bis)
    return F.transform(grams, lambda g: _bucket(g, n_buckets, seed))


def bucket_counts(
    df: DataFrame,
    text_col: str = "text",
    n_buckets: int = 1024,
    seed: str = "dsir",
) -> DataFrame:
    """(bucket, cnt) hashed-n-gram occurrence counts — at most
    ``n_buckets`` output rows regardless of corpus size (one map-side-
    combined aggregation)."""
    return (
        df.select(
            F.explode(hashed_ngram_buckets(F.col(text_col), n_buckets, seed)).alias(
                "bucket"
            )
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_log_ratio(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_buckets: int = 1024,
    seed: str = "dsir",
    alpha: float = 1.0,
) -> DataFrame:
    """(bucket, lw) for every bucket in [0, n_buckets):
    lw = ln p_target(bucket) - ln p_raw(bucket) with add-``alpha``
    smoothing, so unseen buckets are defined on both sides. The result
    is <= n_buckets rows — broadcast it onto the raw corpus."""
    spark = target.sparkSession
    tc = bucket_counts(target, text_col, n_buckets, seed)
    rc = bucket_counts(raw, text_col, n_buckets, seed)
    # coalesce: a corpus with NO n-grams at all (every doc empty) has a
    # NULL sum, which must behave as total 0, not poison every lw
    t_tot = tc.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("t_total"))
    r_tot = rc.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("r_total"))
    ab = float(alpha) * n_buckets
    full = (
        spark.range(n_buckets)
        .select(F.col("id").alias("bucket"))
        .join(tc.withColumnRenamed("cnt", "tc"), "bucket", "left")
        .join(rc.withColumnRenamed("cnt", "rc"), "bucket", "left")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
    )
    lw = (
        F.log(F.coalesce(F.col("tc"), F.lit(0)) + F.lit(float(alpha)))
        - F.log(F.col("t_total") + F.lit(ab))
        - F.log(F.coalesce(F.col("rc"), F.lit(0)) + F.lit(float(alpha)))
        + F.log(F.col("r_total") + F.lit(ab))
    )
    return full.select("bucket", lw.alias("lw"))


def dsir_weights(
    raw: DataFrame,
    ratio: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    seed: str = "dsir",
) -> DataFrame:
    """(id, logw) per raw document: sum of the log importance ratio over
    every n-gram occurrence. ``ratio`` is the <=n_buckets-row table from
    :func:`dsir_log_ratio` and is broadcast; the only raw-corpus shuffle
    is the map-side-combined groupBy(id). Documents with no n-grams
    (empty text) keep a row with logw = 0.0 (posexplode_outer)."""
    exploded = raw.select(
        id_col,
        F.posexplode_outer(
            hashed_ngram_buckets(F.col(text_col), n_buckets, seed)
        ).alias("_pos", "bucket"),
    )
    joined = exploded.join(F.broadcast(ratio), "bucket", "left").select(
        id_col, F.coalesce(F.col("lw"), F.lit(0.0)).alias("lw")
    )
    return joined.groupBy(id_col).agg(F.sum("lw").alias("logw"))


def _gumbel(id_col: Column, seed: str) -> Column:
    """Deterministic md5-derived Gumbel(0,1) noise: u in (0,1) from the
    md5-prefix integer (never exactly 0 or 1 — the +0.5 half-step), then
    g = -ln(-ln(u)). Identical arithmetic is expressible in DuckDB."""
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(seed), id_col.cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 1_000_000
        + F.lit(0.5)
    ) / F.lit(1_000_000.0)
    return -F.log(-F.log(u))


def dsir_select(
    target: DataFrame,
    raw: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    seed: str = "dsir",
    alpha: float = 1.0,
    gumbel: bool = True,
    round_dp: int = 4,
) -> DataFrame:
    """Top-``n`` raw documents by importance (id, weight, score):
    ``weight`` = the raw log importance ratio, ``score`` = weight plus
    md5-derived Gumbel noise (``gumbel=False`` for the deterministic
    rank-by-weight form). Both are rounded to ``round_dp`` before the
    TakeOrdered so cross-engine ln() ulps cannot flip the cutoff;
    residual ties break by id. This IS sampling-without-replacement
    proportional to softmax(weights) — the Gumbel-top-k identity."""
    ratio = dsir_log_ratio(target, raw, text_col, n_buckets, seed, alpha)
    w = dsir_weights(raw, ratio, id_col, text_col, n_buckets, seed)
    score = F.col("logw") + (_gumbel(F.col(id_col), seed) if gumbel else F.lit(0.0))
    scored = w.select(
        id_col,
        F.round(F.col("logw"), round_dp).alias("weight"),
        F.round(score, round_dp).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(n)
