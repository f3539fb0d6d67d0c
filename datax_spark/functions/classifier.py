"""Hashed-bag-of-words linear quality classifier — fastText-style
inference as pure codegen expressions (no Python UDF, no model file).

The production pattern this mirrors: a trained linear text classifier
(fastText's ``predict``, or any logistic-regression-over-hashed-ngrams
scorer) used as a corpus-quality gate ("does this page read like a
reference corpus?") — CCNet and Llama-style pipelines run exactly this
shape over every crawled page. Inference is: tokenize, hash each token
into one of D buckets, look up the bucket's weight, average, squash.
On Spark the weight table is either (a) a broadcast join against a
weights DataFrame (millions of buckets) or (b) for the deterministic
test model here, a closed-form weight DERIVED from the bucket id, which
keeps the whole scorer inside whole-stage codegen with ZERO exchanges
and makes it byte-reproducible in the driver's DuckDB oracle.

Hashing is the md5-prefix integer (same trick as
``operators/sampling.deterministic_sample``), identical in Spark
(``conv(substr(md5(x),1,8),16,10)``) and DuckDB
(``CAST('0x' || substr(md5(x),1,8) AS BIGINT)``).

Scale shape: per-row array math in codegen; composes into any scan for
free. With a real trained model, swap ``_derived_weight`` for a
broadcast ``weights(bucket, w)`` join after ``explode`` — one broadcast,
still no corpus shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# closed-form pseudo-random weight parameters (any fixed LCG-ish mix
# works — the point is determinism across engines, not learning)
_MULT = 48271
_MOD = 65537


def token_bucket(tok: Column, n_buckets: int, seed: str) -> Column:
    """Deterministic token → [0, n_buckets) bucket id (md5-prefix)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed), tok)), 1, 8), 16, 10
    ).cast("bigint")
    return h % n_buckets


def _derived_weight(bucket: Column) -> Column:
    """Closed-form weight in (-0.5, 0.5) from the bucket id — the
    deterministic stand-in for a trained weight vector."""
    return ((bucket * _MULT) % _MOD) / F.lit(float(_MOD)) - 0.5


def hashed_linear_score(
    text: Column,
    n_buckets: int = 1024,
    seed: str = "qclf",
    bias: float = 0.0,
) -> Column:
    """Mean hashed-bucket weight over all (non-distinct) whitespace
    tokens, plus bias — the linear layer's raw logit. Empty documents
    score exactly ``bias``."""
    toks = F.filter(
        F.split(F.lower(text), "\\s+", -1), lambda t: t != ""
    )
    total = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc + _derived_weight(token_bucket(t, n_buckets, seed)),
    )
    n = F.size(toks)
    return F.when(n > 0, total / n).otherwise(F.lit(0.0)) + F.lit(bias)


def classify_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    seed: str = "qclf",
    threshold: float = 0.0,
) -> DataFrame:
    """(id, score, keep) — the corpus-gate form: logit rounded to 4
    places (float-compare-safe across engines), ``keep`` = logit >
    threshold. Chain ``.filter("keep")`` to use it as a curation gate."""
    logit = hashed_linear_score(F.col(text_col), n_buckets, seed)
    return df.select(
        id_col,
        F.round(logit, 4).alias("score"),
        (logit > threshold).alias("keep"),
    )


def classify_quality_broadcast(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    seed: str = "qclf",
    threshold: float = 0.0,
) -> DataFrame:
    """The real-model form: ``weights(bucket:long, w:double)`` is a
    trained table (fastText input matrix row-norms, an LR coefficient
    vector, …). Explode tokens → broadcast-join weights → mean per doc.
    One broadcast + one groupBy(id) keyed exactly like the scan's
    partitioning; missing buckets contribute weight 0 (left join).

    Used by tests to prove score-equality with the closed-form path
    when ``weights`` is generated from ``_derived_weight``.
    """
    # posexplode_OUTER: an empty/whitespace-only doc emits one null-token
    # row instead of vanishing, so this form returns the same ROW SET as
    # the closed-form path (empty docs score exactly bias = 0)
    toks = df.select(
        id_col,
        F.posexplode_outer(
            F.filter(F.split(F.lower(F.col(text_col)), "\\s+", -1),
                     lambda t: t != "")
        ).alias("_pos", "_tok"),
    ).select(
        id_col,
        token_bucket(F.col("_tok"), n_buckets, seed).alias("bucket"),
        F.col("_tok").isNotNull().alias("_real"),
    )
    scored = toks.join(F.broadcast(weights), "bucket", "left").select(
        id_col, "_real", F.coalesce(F.col("w"), F.lit(0.0)).alias("w")
    )
    n_real = F.sum(F.col("_real").cast("int"))
    logit = F.when(n_real > 0, F.sum("w") / n_real).otherwise(F.lit(0.0))
    return (
        scored.groupBy(id_col)
        .agg(
            F.round(logit, 4).alias("score"),
            (logit > threshold).alias("keep"),
        )
    )


def derived_weights_table(spark, n_buckets: int = 1024) -> DataFrame:
    """Materialize the closed-form model as a weights DataFrame (what a
    real checkpoint-loaded model would look like)."""
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        _derived_weight(F.col("id")).alias("w"),
    )
