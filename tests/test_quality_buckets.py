"""CCNet-style frequency quality binning (operators/curation.py
frequency_quality_buckets) — differential vs a python reference, plus
the production fixed-threshold projection mode."""

from __future__ import annotations

import math

from datax_spark.operators.curation import frequency_quality_buckets

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the the the the"),
    (2, "zyx qwv unseen tokens entirely"),
    (3, "the cat likes fish"),
    (4, "cat mat fish on"),
]


def _py_buckets(docs, vocab_size=4096, n_buckets=3):
    toks = {i: [t for t in s.split(" ") if t] for i, s in docs}
    freq: dict[str, int] = {}
    for tk in toks.values():
        for t in tk:
            freq[t] = freq.get(t, 0) + 1
    vocab = dict(
        sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    )
    scores = {
        i: round(sum(math.log(1 + vocab.get(t, 0)) for t in tk) / len(tk), 4)
        for i, tk in toks.items()
        if tk
    }
    order = sorted(scores, key=lambda i: (-scores[i], i))
    n = len(order)
    out, pos = {}, 0
    for b in range(1, n_buckets + 1):
        size = n // n_buckets + (1 if b <= n % n_buckets else 0)
        for i in order[pos:pos + size]:
            out[i] = (scores[i], b)
        pos += size
    return out


def test_buckets_match_python_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: (r["score"], r["bucket"])
           for r in frequency_quality_buckets(df).collect()}
    assert got == _py_buckets(DOCS)
    # all-common doc heads the ranking, all-OOV-rare doc tails it
    assert got[1][1] == 1 and got[2][1] == 3


def test_threshold_mode_is_a_projection(spark):
    """Fixed cutoffs (the production CCNet shape) bucket without the
    global ntile sort: same scores, buckets from the thresholds."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    exact = {r["doc_id"]: r["score"]
             for r in frequency_quality_buckets(df).collect()}
    got = {r["doc_id"]: (r["score"], r["bucket"])
           for r in frequency_quality_buckets(df, thresholds=(1.5, 1.0)).collect()}
    for i, s in exact.items():
        want = 1 if s >= 1.5 else (2 if s >= 1.0 else 3)
        assert got[i] == (s, want)
    # and no ntile window appears in the threshold-mode plan
    plan = frequency_quality_buckets(
        df, thresholds=(1.5, 1.0)
    )._jdf.queryExecution().executedPlan().toString()
    assert "ntile" not in plan.lower()
