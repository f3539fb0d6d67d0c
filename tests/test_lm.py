"""Bigram-LM perplexity scoring (operators/lm.py) — differential vs a
pure-python add-k bigram model."""

from __future__ import annotations

import math
from collections import Counter

from datax_spark.operators.lm import (
    lm_score,
    perplexity_filter,
    train_bigram_lm,
)

CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat on the hat"),
    (2, "the dog sat on the mat"),
    (3, "colorless green ideas sleep furiously"),
    (4, "the"),        # single token: no bigrams
    (5, ""),           # empty
]


def _py_model(texts):
    big, ctx, vocab = Counter(), Counter(), set()
    for t in texts:
        toks = [w for w in t.lower().split() if w]
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] += 1
            ctx[a] += 1
    return big, ctx, len(vocab)


def _py_score(text, big, ctx, v, k=0.5):
    toks = [w for w in text.lower().split() if w]
    lps = [
        math.log((big.get((a, b), 0) + k) / (ctx.get(a, 0) + k * v))
        for a, b in zip(toks, toks[1:])
    ]
    return round(sum(lps) / len(lps), 4) if lps else 0.0


def test_lm_score_matches_python(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    bigrams, contexts, v = train_bigram_lm(df)
    big, ctx, pv = _py_model([t for _, t in CORPUS])
    assert v == pv
    got = {r["doc_id"]: (r["lm_score"], r["n_bigrams"])
           for r in lm_score(df, bigrams, contexts, v).collect()}
    for doc_id, text in CORPUS:
        want = _py_score(text, big, ctx, v)
        assert abs(got[doc_id][0] - want) < 1e-9, (doc_id, got[doc_id], want)
    assert got[4] == (0.0, 0) and got[5] == (0.0, 0)
    # formulaic docs under the corpus model outscore the outlier
    assert got[0][0] > got[3][0]


def test_perplexity_filter_keeps_fluent_head(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    bigrams, contexts, v = train_bigram_lm(df)
    scores = {r["doc_id"]: r["lm_score"]
              for r in lm_score(df, bigrams, contexts, v).collect()}
    thr = scores[3] + 1e-6  # just above the outlier
    kept = {r["doc_id"] for r in perplexity_filter(df, thr).collect()}
    assert 3 not in kept
    assert {0, 1, 2} <= kept


def test_unseen_bigrams_get_smoothing_mass(spark):
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    bigrams, contexts, v = train_bigram_lm(corpus)
    new = spark.createDataFrame(
        [(9, "mat cat dog the")],  # tokens seen, bigrams unseen
        "doc_id long, text string",
    )
    got = lm_score(new, bigrams, contexts, v).collect()[0]
    assert got["n_bigrams"] == 3
    assert got["lm_score"] < -1.0  # smoothed, strictly finite
