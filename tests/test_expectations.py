"""Declarative expectations (operators/expectations.py)."""

from __future__ import annotations

import pytest

from datax_spark.operators.expectations import (
    check,
    enforce,
    in_range,
    in_set,
    matches,
    min_rows,
    not_null,
    unique,
)


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "en", 10.0, "http://a.example/x"),
            (2, "de", 20.0, "http://b.example/y"),
            (3, None, 300.0, "not a url"),
            (3, "fr", 40.0, "http://c.example/z"),
        ],
        "id long, lang string, score double, url string",
    )


EXPECTS = [
    not_null("lang", threshold=0.7),
    unique("id"),
    in_set("lang", ["en", "de", "fr"], threshold=0.75),
    in_range("score", 0, 100, threshold=0.9),
    matches("url", "^https?://", threshold=0.75),
    min_rows(4),
]


def test_metrics_and_verdicts(spark):
    got = {r["constraint"]: (r["metric"], r["passed"]) for r in check(_df(spark), EXPECTS).collect()}
    assert got["not_null(lang)"] == (0.75, True)
    assert got["unique(id)"] == (0.75, False)       # 3 distinct / 4 rows
    assert got["in_set(lang)"] == (0.75, True)
    assert got["in_range(score)"] == (0.75, False)  # 300 out of range
    assert got["matches(url)"] == (0.75, True)
    assert got["min_rows"] == (1.0, True)


def test_single_fused_job(spark):
    plan = (
        check(_df(spark), EXPECTS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one aggregate pass over one scan: no join, no second scan
    assert plan.count("Scan ExistingRDD") == 1
    assert "Join" not in plan


def test_enforce_raises_with_names(spark):
    with pytest.raises(ValueError) as e:
        enforce(_df(spark), EXPECTS)
    msg = str(e.value)
    assert "unique(id)" in msg and "in_range(score)" in msg
    assert "not_null(lang)" not in msg
    # and passes when the constraints match reality
    enforce(_df(spark), [not_null("id"), min_rows(2)])
