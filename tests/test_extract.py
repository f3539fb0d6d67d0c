"""Extractor golden tests — the byte-identity contract (BASELINE.json:15).

The golden file is APPEND-ONLY once frozen; these tests failing means the
frozen extractor spec was changed, which breaks replay equivalence.
"""

from __future__ import annotations

import hashlib
import json
import unicodedata
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from datax_spark.functions.extract import (
    decode_html,
    extract_text,
    extract_text_udf,
    extract_title,
)

FIXDIR = Path(__file__).parent / "fixtures" / "html"
GOLDEN = Path(__file__).parent / "fixtures" / "golden_extract.jsonl"


def _golden() -> list[dict]:
    return [json.loads(line) for line in GOLDEN.read_text().splitlines()]


@pytest.mark.parametrize("case", _golden(), ids=lambda c: c["file"])
def test_golden_bytes(case):
    raw = (FIXDIR / case["file"]).read_bytes()
    text = extract_text(raw)
    assert hashlib.sha256(text.encode("utf-8")).hexdigest() == case["sha256_text"]
    assert len(text) == case["len_text"]
    assert extract_title(raw) == case["title"]


def test_deterministic_repeat():
    raw = (FIXDIR / "basic.html").read_bytes()
    assert extract_text(raw) == extract_text(raw)


def test_nfc_normalized():
    decomposed = "Café"  # e + combining acute
    text = extract_text(f"<p>{decomposed}</p>".encode())
    assert text == unicodedata.normalize("NFC", decomposed)


def test_charset_detection_order():
    assert decode_html(b"\xef\xbb\xbfabc") == "abc"
    assert "é" in decode_html(b"<meta charset='latin-1'><p>caf\xe9</p>")
    assert "é" in decode_html("café".encode())
    assert decode_html(b"\xff\xfe_undeclared") != ""


def test_none_and_str_inputs():
    assert extract_text(None) is None
    assert extract_text("<p>plain str</p>") == "plain str"


def test_udf_matches_pure_python(spark):
    rows = [(c["file"], (FIXDIR / c["file"]).read_bytes()) for c in _golden()]
    df = spark.createDataFrame(rows, "file string, html binary")
    got = {
        r["file"]: r["text"]
        for r in df.select("file", extract_text_udf(F.col("html")).alias("text")).collect()
    }
    for name, raw in rows:
        assert got[name] == extract_text(raw), name


def test_udf_is_arrow_vectorized(spark):
    df = spark.createDataFrame([(b"<p>x</p>",)], "html binary")
    plan = df.select(extract_text_udf("html")).sample(False, 1.0)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan
