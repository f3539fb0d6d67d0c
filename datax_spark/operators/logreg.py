"""Distributed logistic-regression training over hashed text features —
the TRAIN side of the fastText-style quality classifier whose inference
path lives in ``functions/classifier.py`` ("swap the derived weight for
a broadcast weights join"). CCNet / GPT-3 / Llama-class pipelines gate
crawled pages with exactly this model shape: hash n-grams into D
buckets, learn one weight per bucket + a bias, squash the dot product.

Training follows the MLlib/parameter-server-on-driver pattern, the
right distribution for this geometry (corpus huge, model tiny):

* the WEIGHT VECTOR (``n_buckets`` floats — a few MB at fastText's
  2^20) lives on the driver as numpy and is re-broadcast each round as
  a weights DataFrame (broadcast hash join, never a corpus shuffle);
* each iteration runs full-batch gradient descent as TWO map-side-
  combined aggregations over the cached feature relation:
  margins = one groupBy(id) of x·w (the only corpus-wide shuffle,
  one narrow row per (doc, bucket)); gradients = one groupBy(bucket)
  of err·x whose output is ≤ ``n_buckets`` rows — corpus-size
  independent, so the driver collect is O(model), not O(data);
* features are computed ONCE (hashed unigram+bigram multiset, the
  same pure-codegen ``dsir.hashed_ngram_buckets`` featurizer — no
  n-gram string ever shuffles) and cached; iterations touch only the
  cached narrow relation.

At 10^10 documents nothing above changes: the feature relation is the
one big artifact (persist to disk-backed storage), every per-iteration
shuffle carries (id|bucket, float) pairs, and the model still fits in
one driver heap. Full-batch GD is deterministic given the corpus —
no sampling order, no race — which keeps training replayable; swap in
a deterministic md5-gated minibatch (operators/sampling) if rounds
must be cheaper than a corpus pass.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datax_spark.operators.dsir import hashed_ngram_buckets


@dataclass
class LogRegModel:
    n_buckets: int
    seed: str
    normalize: bool
    weights: dict[int, float]  # sparse: only buckets ever seen move
    bias: float = 0.0
    losses: list[float] = field(default_factory=list)  # mean log-loss/iter


def featurize(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1 << 14,
    seed: str = "logreg",
    normalize: bool = True,
) -> DataFrame:
    """(id, bucket, x): hashed unigram+bigram occurrence counts,
    L1-normalized per document by default (fastText averages, which
    keeps margins O(1) regardless of document length — raw counts make
    long pages dominate the gradient and blow up the sigmoid)."""
    b = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(
                hashed_ngram_buckets(F.col(text_col), n_buckets, seed)
            ).alias("bucket"),
        )
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )
    if not normalize:
        return b.select("id", "bucket", F.col("cnt").alias("x"))
    tot = F.sum("cnt").over(Window.partitionBy("id"))
    return b.select("id", "bucket", (F.col("cnt") / tot).alias("x"))


def train_logreg(
    df: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1 << 14,
    seed: str = "logreg",
    normalize: bool = True,
    n_iters: int = 30,
    lr: float = 2.0,
    l2: float = 0.0,
) -> LogRegModel:
    """Full-batch GD on mean logistic loss. ``label_col`` is 0/1.
    Returns the trained model with per-iteration mean log-loss (strictly
    decreasing for any lr below the loss's smoothness bound — the test
    suite's convergence gate)."""
    spark = df.sparkSession
    feats = featurize(df, id_col, text_col, n_buckets, seed, normalize)
    labels = df.select(
        F.col(id_col).alias("id"), F.col(label_col).cast("double").alias("y")
    )
    feats = feats.join(labels, "id").persist()
    n_docs = labels.count()
    if n_docs == 0:
        raise ValueError("cannot train on an empty corpus")

    w: dict[int, float] = {}
    bias = 0.0
    losses: list[float] = []
    try:
        for _ in range(n_iters):
            if w:
                wdf = F.broadcast(
                    spark.createDataFrame(
                        list(w.items()), "bucket bigint, w double"
                    )
                )
                joined = feats.join(wdf, "bucket", "left")
            else:
                joined = feats.withColumn("w", F.lit(None).cast("double"))
            margins = joined.groupBy("id", "y").agg(
                (F.sum(F.col("x") * F.coalesce(F.col("w"), F.lit(0.0))) + bias).alias("m")
            )
            errs = margins.select(
                "id",
                (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m"))) - F.col("y")).alias(
                    "err"
                ),
                # log(1+exp(-z)) with the standard overflow-safe split
                F.when(
                    F.col("y") == 1.0,
                    F.when(F.col("m") > 0, F.log1p(F.exp(-F.col("m"))))
                    .otherwise(-F.col("m") + F.log1p(F.exp(F.col("m")))),
                )
                .otherwise(
                    F.when(F.col("m") > 0, F.col("m") + F.log1p(F.exp(-F.col("m"))))
                    .otherwise(F.log1p(F.exp(F.col("m"))))
                )
                .alias("nll"),
            ).persist()
            grad_rows = (
                feats.join(errs.select("id", "err"), "id")
                .groupBy("bucket")
                .agg(F.sum(F.col("x") * F.col("err")).alias("g"))
                .collect()
            )
            agg = errs.agg(
                F.sum("err").alias("gb"), F.sum("nll").alias("nll")
            ).first()
            errs.unpersist()
            for r in grad_rows:
                j = r["bucket"]
                w[j] = w.get(j, 0.0) - lr * (r["g"] / n_docs + l2 * w.get(j, 0.0))
            bias -= lr * (agg["gb"] / n_docs)
            losses.append(agg["nll"] / n_docs)
    finally:
        feats.unpersist()
    return LogRegModel(n_buckets, seed, normalize, w, bias, losses)


def one_step_scores(
    df: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    seed: str = "lrstep",
    lr_pow2: int = 10,
) -> DataFrame:
    """(id, score): one exact full-batch GD step from w = 0, then the
    linear score under those weights — the SQL-checkable core of the
    training loop. At w = 0 every sigmoid is exactly 0.5, so
    grad_j = Σ_d (0.5 − y_d)·x_jd with INTEGER counts x: every term is
    ±0.5 × int, the step w_j = −grad_j / 2^lr_pow2 divides by a power
    of two, and the score Σ_j w_j·x_jd multiplies dyadics by ints —
    ALL arithmetic is exact dyadic rationals, so the result is
    bit-identical in any IEEE-754 engine under any summation order
    (the integer-exact-race trick, applied to a gradient). The driver
    oracles this row; the full iterative path above is gated by the
    numpy differential instead (sigmoids aren't cross-engine-exact).

    Plan: two map-side-combined groupBys over the (id, bucket, cnt)
    relation plus one broadcast of the ≤ n_buckets gradient table —
    the corpus never shuffles wider than a narrow feature row."""
    feats = featurize(
        df, id_col, text_col, n_buckets, seed, normalize=False
    )
    labels = df.select(
        F.col(id_col).alias("id"), F.col(label_col).cast("double").alias("y")
    )
    grad = (
        feats.join(labels, "id")
        .groupBy("bucket")
        .agg(F.sum((F.lit(0.5) - F.col("y")) * F.col("x")).alias("g"))
    )
    w = grad.select("bucket", (-F.col("g") / F.lit(float(1 << lr_pow2))).alias("w"))
    scores = (
        feats.join(F.broadcast(w), "bucket")
        .groupBy("id")
        .agg(F.sum(F.col("x") * F.col("w")).alias("s"))
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(scores, "id", "left")
        .select("id", F.coalesce(F.col("s"), F.lit(0.0)).alias("score"))
    )


def score_logreg(
    df: DataFrame,
    model: LogRegModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, p): P(label=1) per document under the trained model — one
    broadcast weights join + one groupBy(id); the corpus never
    shuffles wider than (id, bucket, x). Documents with no features
    score sigmoid(bias)."""
    spark = df.sparkSession
    feats = featurize(
        df, id_col, text_col, model.n_buckets, model.seed, model.normalize
    )
    wdf = F.broadcast(
        spark.createDataFrame(
            list(model.weights.items()) or [(-1, 0.0)], "bucket bigint, w double"
        )
    )
    margins = (
        feats.join(wdf, "bucket", "left")
        .groupBy("id")
        .agg(F.sum(F.col("x") * F.coalesce(F.col("w"), F.lit(0.0))).alias("dot"))
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(margins, "id", "left")
        .select(
            "id",
            (
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(-(F.coalesce(F.col("dot"), F.lit(0.0)) + model.bias))
                )
            ).alias("p"),
        )
    )
