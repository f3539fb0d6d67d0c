"""Unicode normalization (functions/unicode.py)."""

from __future__ import annotations

import unicodedata

from pyspark.sql import functions as F

from datax_spark.functions.unicode import clean_unicode, nfc, nfkc

DECOMP = "café"          # e + combining acute
FULLW = "Ｆｕｌｌ１２３"        # fullwidth compatibility chars
MESSY = "a​b  c  d　e"  # zero-width, nbsp, wide space, runs


def _df(spark):
    return spark.createDataFrame(
        [(1, DECOMP), (2, FULLW), (3, MESSY), (4, None)],
        "id long, s string",
    )


def test_nfc_composes(spark):
    out = {r["id"]: r["o"] for r in _df(spark).select("id", nfc("s").alias("o")).collect()}
    assert out[1] == "café" and len(out[1]) == 4
    assert out[2] == FULLW          # NFC keeps compatibility chars
    assert out[4] is None


def test_nfkc_folds_compat(spark):
    out = {r["id"]: r["o"] for r in _df(spark).select("id", nfkc("s").alias("o")).collect()}
    assert out[2] == "Full123"
    assert out[1] == "café"


def test_clean_unicode_full_path(spark):
    out = {
        r["id"]: r["o"]
        for r in _df(spark).select(
            "id", clean_unicode("s", casefold=True).alias("o")
        ).collect()
    }
    assert out[3] == "ab c d e"
    assert out[2] == "full123"
    assert out[1] == "café"


def test_matches_python_unicodedata(spark):
    # differential vs CPython's normalizer on every fixture
    rows = _df(spark).select("s", nfkc("s").alias("o")).collect()
    for r in rows:
        if r["s"] is not None:
            assert r["o"] == unicodedata.normalize("NFKC", r["s"])


def test_arrow_only_plan(spark):
    plan = (
        _df(spark).select(nfc("s"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan
