"""DSIR importance resampling — pure-python differential + semantics.

The engine's hashed-n-gram featurization, smoothed log-ratio table, and
per-doc importance weights must match a 30-line pure-python reference
exactly (same md5 bucket hash, same add-alpha smoothing); selection must
prefer target-looking documents and stay deterministic.
"""

from __future__ import annotations

import hashlib
import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datax_spark.operators.dsir import (
    bucket_counts,
    dsir_log_ratio,
    dsir_select,
    dsir_weights,
    hashed_ngram_buckets,
)

B = 64
SEED = "dsir"

TARGET = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick red fox runs over the green hill"),
    (2, "a lazy dog sleeps under the brown tree"),
    (3, "quick foxes and lazy dogs share the hill"),
]
RAW = [
    (10, "the quick brown fox naps beside the lazy dog"),  # target-like
    (11, "quick brown foxes jump over lazy dogs daily"),  # target-like
    (12, "stock prices fell sharply amid rate fears"),  # off-target
    (13, "parliament votes on the budget amendment today"),  # off-target
    (14, "the the the the the"),  # degenerate repetition
    (15, ""),  # empty
    (16, "zzz"),  # single token, no bigrams
    (17, "quick quick quick lazy lazy dog"),
]


def py_buckets(text: str) -> list[int]:
    toks = [t for t in re.split(r"\s+", text.lower()) if t]
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [
        int(hashlib.md5((SEED + g).encode()).hexdigest()[:8], 16) % B for g in grams
    ]


def py_ratio(target_rows, raw_rows, alpha=1.0) -> dict[int, float]:
    tc: dict[int, int] = {}
    rc: dict[int, int] = {}
    for _, t in target_rows:
        for b in py_buckets(t):
            tc[b] = tc.get(b, 0) + 1
    for _, t in raw_rows:
        for b in py_buckets(t):
            rc[b] = rc.get(b, 0) + 1
    tt, rt = sum(tc.values()), sum(rc.values())
    return {
        b: math.log((tc.get(b, 0) + alpha) / (tt + alpha * B))
        - math.log((rc.get(b, 0) + alpha) / (rt + alpha * B))
        for b in range(B)
    }


def py_weights(target_rows, raw_rows, alpha=1.0) -> dict[int, float]:
    lw = py_ratio(target_rows, raw_rows, alpha)
    return {
        i: sum(lw[b] for b in py_buckets(t)) for i, t in raw_rows
    }


def _dfs(spark):
    t = spark.createDataFrame(TARGET, "doc_id bigint, text string")
    r = spark.createDataFrame(RAW, "doc_id bigint, text string")
    return t, r


def test_bucket_featurization_matches_python(spark):
    t, _ = _dfs(spark)
    got = {
        r["doc_id"]: list(r["bk"])
        for r in t.select(
            "doc_id", hashed_ngram_buckets(F.col("text"), B, SEED).alias("bk")
        ).collect()
    }
    for i, text in TARGET:
        assert got[i] == py_buckets(text), f"doc {i}"


def test_bucket_counts_match_python(spark):
    t, _ = _dfs(spark)
    exp: dict[int, int] = {}
    for _, text in TARGET:
        for b in py_buckets(text):
            exp[b] = exp.get(b, 0) + 1
    got = {r["bucket"]: r["cnt"] for r in bucket_counts(t, n_buckets=B).collect()}
    assert got == exp


def test_weights_match_python_reference(spark):
    t, r = _dfs(spark)
    ratio = dsir_log_ratio(t, r, n_buckets=B)
    w = {
        row["doc_id"]: row["logw"]
        for row in dsir_weights(r, ratio, n_buckets=B).collect()
    }
    exp = py_weights(TARGET, RAW)
    assert set(w) == set(exp)
    for i in exp:
        assert abs(w[i] - exp[i]) < 1e-9, f"doc {i}: {w[i]} vs {exp[i]}"


def test_empty_doc_keeps_zero_weight_row(spark):
    t, r = _dfs(spark)
    ratio = dsir_log_ratio(t, r, n_buckets=B)
    w = {
        row["doc_id"]: row["logw"]
        for row in dsir_weights(r, ratio, n_buckets=B).collect()
    }
    assert w[15] == 0.0


def test_selection_prefers_target_like_docs(spark):
    """Among comparable-length docs, target-vocabulary docs outrank
    off-target ones. (Degenerate short/empty docs legitimately score
    near 0 and beat long docs' negative sums — the published behavior;
    DSIR runs after basic quality gates for exactly that reason.)"""
    t, r = _dfs(spark)
    r4 = r.filter(F.col("doc_id").isin(10, 11, 12, 13))
    out = dsir_select(t, r4, n=2, n_buckets=B, gumbel=False).collect()
    picked = {row["doc_id"] for row in out}
    assert picked == {10, 11}


def test_gumbel_selection_deterministic_and_weight_consistent(spark):
    t, r = _dfs(spark)
    a = dsir_select(t, r, n=3, n_buckets=B).collect()
    b = dsir_select(t, r, n=3, n_buckets=B).collect()
    assert [tuple(x) for x in a] == [tuple(x) for x in b]
    # score = weight + gumbel noise; both columns populated and finite
    for row in a:
        assert row["weight"] is not None and row["score"] is not None


def test_jobspec_dsir_and_split_transforms(spark, tmp_path):
    """dsirSelect and clusterSplit as job-spec transforms: one config
    selects target-like docs and tags leakage-safe splits end to end."""
    from datax_spark.jobspec import run_batch_job

    t, r = _dfs(spark)
    t.write.parquet(str(tmp_path / "target"))
    r.filter(F.col("doc_id").isin(10, 11, 12, 13)).write.parquet(
        str(tmp_path / "raw")
    )
    spec = {
        "reader": {"type": "parquet", "path": str(tmp_path / "raw")},
        "transforms": [
            {
                "op": "dsirSelect",
                "target": {"type": "parquet", "path": str(tmp_path / "target")},
                "n": 2,
                "nBuckets": B,
                "gumbel": False,
            },
            {"op": "clusterSplit", "jaccardThreshold": 0.5},
        ],
        "writer": {
            "type": "parquet",
            "path": str(tmp_path / "out"),
            "mode": "overwrite",
        },
    }
    run_batch_job(spark, spec)
    back = spark.read.parquet(str(tmp_path / "out"))
    rows = {row["doc_id"]: row for row in back.collect()}
    assert set(rows) == {10, 11}  # the target-like pair
    for row in rows.values():
        assert row["split"] in ("train", "val", "test")
        assert row["weight"] is not None and row["cluster_id"] is not None
        assert row["text"]  # original columns survive the join


_doc_st = st.text(alphabet="ab x\tZ.9", min_size=0, max_size=40)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(
    st.lists(_doc_st, min_size=2, max_size=8),
    st.lists(_doc_st, min_size=2, max_size=8),
)
def test_weights_match_python_on_random_corpora(spark, t_texts, r_texts):
    """Hypothesis differential: arbitrary (whitespace-heavy, empty,
    punctuation) corpora — engine weights == pure-python to 1e-9."""
    trows = list(enumerate(t_texts))
    rrows = [(100 + i, s) for i, s in enumerate(r_texts)]
    t = spark.createDataFrame(trows, "doc_id bigint, text string")
    r = spark.createDataFrame(rrows, "doc_id bigint, text string")
    ratio = dsir_log_ratio(t, r, n_buckets=B)
    got = {
        row["doc_id"]: row["logw"]
        for row in dsir_weights(r, ratio, n_buckets=B).collect()
    }
    exp = py_weights(trows, rrows)
    assert set(got) == set(exp)
    for i in exp:
        assert abs(got[i] - exp[i]) < 1e-9, (i, got[i], exp[i])


def test_plan_shape(spark):
    """Ratio table broadcasts onto the corpus; selection is TakeOrdered
    (per-partition top-n, no global sort); no cartesian product."""
    t, r = _dfs(spark)
    plan = dsir_select(t, r, n=3, n_buckets=B)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrdered" in plan
