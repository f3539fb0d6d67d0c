"""Benchmark decontamination tests (operators/decontaminate.py)."""

from __future__ import annotations

import pytest

from datax_spark.operators.decontaminate import decontaminate, ngram_contamination


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),       # contains bench gram
            (1, "totally unrelated words about spark jobs"),  # clean
            (2, "prefix alpha beta gamma suffix tail"),       # shares 'alpha beta gamma'
            (3, "one two"),                                   # < n words: no grams
            (4, "beta gamma delta and alpha beta gamma too"), # two distinct hits
        ],
        "doc_id long, text string",
    )


@pytest.fixture(scope="module")
def bench_docs(spark):
    return spark.createDataFrame(
        [(100, "alpha beta gamma delta"), (101, "nothing matches here at all")],
        "doc_id long, text string",
    )


def test_contamination_report(corpus, bench_docs):
    rows = {
        r["doc_id"]: (r["n_hit_grams"], r["contaminated"])
        for r in ngram_contamination(corpus, bench_docs, n=3).collect()
    }
    assert len(rows) == 5  # every doc reported
    # bench 3-grams: {alpha beta gamma, beta gamma delta} + the 101 ones
    assert rows[0] == (2, True)
    assert rows[1] == (0, False)
    assert rows[2] == (1, True)
    assert rows[3] == (0, False)  # too short for any 3-gram
    assert rows[4] == (2, True)   # distinct hits counted once each


def test_decontaminate_drops_flagged(corpus, bench_docs):
    kept = sorted(r["doc_id"] for r in decontaminate(corpus, bench_docs, n=3).collect())
    assert kept == [1, 3]


def test_min_hits_threshold(corpus, bench_docs):
    kept = sorted(
        r["doc_id"] for r in decontaminate(corpus, bench_docs, n=3, min_hits=2).collect()
    )
    assert kept == [1, 2, 3]  # single-gram overlap survives at min_hits=2


def test_benchmark_side_broadcasts(corpus, bench_docs):
    plan = ngram_contamination(corpus, bench_docs, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
