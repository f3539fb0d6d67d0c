"""Trained hashed-feature logistic regression (operators/logreg.py):
numpy differential on the exact same feature matrix, convergence and
separation gates, and the scoring plan's physical shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from datax_spark.operators.logreg import (
    featurize,
    score_logreg,
    train_logreg,
)

B = 1 << 10  # small bucket space keeps the differential dense enough


def _corpus(spark, n=60):
    """Separable-ish: even ids read like boilerplate spam, odd ids like
    prose; shared filler tokens overlap the classes."""
    rows = []
    for i in range(n):
        filler = f"the a of page {i % 7}"
        if i % 2 == 0:
            rows.append((i, f"buy cheap now click here win {filler}", 0))
        else:
            rows.append((i, f"history of the region and its rivers {filler}", 1))
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


def _numpy_reference(feat_rows, label_map, n_docs, n_iters, lr):
    """Dense full-batch GD mirroring train_logreg exactly (same init,
    same update order, same mean-loss), on the features Spark built."""
    ids = sorted({r["id"] for r in feat_rows} | set(label_map))
    idx = {d: k for k, d in enumerate(ids)}
    X = np.zeros((len(ids), B))
    for r in feat_rows:
        X[idx[r["id"]], r["bucket"]] += r["x"]
    y = np.array([label_map[d] for d in ids], dtype=float)
    w = np.zeros(B)
    b = 0.0
    losses = []
    for _ in range(n_iters):
        m = X @ w + b
        p = 1.0 / (1.0 + np.exp(-m))
        losses.append(
            float(np.mean(np.where(m > 0, np.log1p(np.exp(-m)), -m + np.log1p(np.exp(m))) * y
                          + np.where(m > 0, m + np.log1p(np.exp(-m)), np.log1p(np.exp(m))) * (1 - y)))
        )
        err = p - y
        w -= lr * (X.T @ err) / n_docs
        b -= lr * float(err.sum()) / n_docs
    return w, b, losses


def test_matches_numpy_reference(spark):
    docs = _corpus(spark)
    n_iters, lr = 8, 1.0
    model = train_logreg(
        docs, "y", n_buckets=B, n_iters=n_iters, lr=lr, seed="t"
    )
    feat_rows = featurize(docs, n_buckets=B, seed="t").collect()
    labels = {r["doc_id"]: r["y"] for r in docs.collect()}
    w_ref, b_ref, loss_ref = _numpy_reference(
        feat_rows, labels, docs.count(), n_iters, lr
    )
    assert model.bias == pytest.approx(b_ref, abs=1e-9)
    for j, wj in model.weights.items():
        assert wj == pytest.approx(w_ref[j], abs=1e-9), f"bucket {j}"
    # buckets the model never touched must be zero in the reference too
    untouched = set(range(B)) - set(model.weights)
    assert all(w_ref[j] == 0.0 for j in untouched)
    assert model.losses == pytest.approx(loss_ref, abs=1e-9)


def test_loss_decreases_and_separates(spark):
    docs = _corpus(spark)
    model = train_logreg(docs, "y", n_buckets=B, n_iters=25, lr=2.0)
    assert all(
        b < a + 1e-12 for a, b in zip(model.losses, model.losses[1:])
    ), "full-batch GD loss must be non-increasing at this lr"
    scored = score_logreg(docs, model).join(
        docs.select(F.col("doc_id").alias("id"), "y"), "id"
    )
    rows = scored.collect()
    acc = sum((r["p"] > 0.5) == (r["y"] == 1) for r in rows) / len(rows)
    assert acc == 1.0  # the corpus is separable; GD must separate it


def test_empty_feature_doc_scores_bias(spark):
    docs = spark.createDataFrame(
        [(1, "good good prose words", 1), (2, "spam spam spam junk", 0), (3, "", 1)],
        "doc_id long, text string, y int",
    )
    model = train_logreg(docs, "y", n_buckets=B, n_iters=5, lr=1.0)
    p3 = {r["id"]: r["p"] for r in score_logreg(docs, model).collect()}[3]
    expect = 1.0 / (1.0 + np.exp(-model.bias))
    assert p3 == pytest.approx(expect, abs=1e-12)


def test_scoring_plan_shape(spark):
    """Weights broadcast (never shuffled onto the corpus), no per-row
    Python, no cartesian product."""
    docs = _corpus(spark, n=20)
    model = train_logreg(docs, "y", n_buckets=B, n_iters=2, lr=1.0)
    plan = score_logreg(docs, model)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_l2_shrinks_weights(spark):
    docs = _corpus(spark)
    free = train_logreg(docs, "y", n_buckets=B, n_iters=10, lr=1.0, l2=0.0)
    reg = train_logreg(docs, "y", n_buckets=B, n_iters=10, lr=1.0, l2=0.5)
    n_free = sum(v * v for v in free.weights.values())
    n_reg = sum(v * v for v in reg.weights.values())
    assert n_reg < n_free
