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


# ------------------------------------------------------------------ #
# fast-scanner differential (byte-identity of the fast path)
# ------------------------------------------------------------------ #

def test_golden_bytes_reference_path():
    """The frozen html.parser path still matches the goldens (the fast
    scanner is a physical optimization on top, never a spec change)."""
    from datax_spark.functions.extract import (
        extract_text_reference,
        extract_title_reference,
    )

    for case in _golden():
        raw = (FIXDIR / case["file"]).read_bytes()
        text = extract_text_reference(raw)
        assert hashlib.sha256(text.encode("utf-8")).hexdigest() == case["sha256_text"]
        assert extract_title_reference(raw) == case["title"]


def test_fast_scanner_engages_on_generator_pages():
    """The fast path must actually cover the synthetic corpus (else the
    optimization is dead code in the benchmark)."""
    import random

    from datax_spark.datagen.generator import _make_html
    from datax_spark.functions.extract import _fast_scan, decode_html

    rng = random.Random(1)
    hits = 0
    for i in range(50):
        html = _make_html(rng, f"https://d/{i}", i, f"t{i}")
        if _fast_scan(decode_html(html)) is not None:
            hits += 1
    assert hits == 50


def test_fast_scanner_differential():
    """hypothesis: fast scanner output == frozen html.parser output on
    adversarial html-ish inputs (the scanner may decline — then the
    fallback IS the reference — but must never disagree)."""
    from hypothesis import given, settings, strategies as st

    from datax_spark.functions.extract import (
        extract_text,
        extract_text_reference,
        extract_title,
        extract_title_reference,
    )

    tags = st.sampled_from(
        ["p", "div", "span", "b", "li", "ul", "title", "script", "style",
         "nav", "br", "hr", "head", "body", "html", "em", "td", "table"]
    )
    words = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=12
    )
    chunk = st.one_of(
        words,
        st.sampled_from(
            ["&amp;", "&lt;", "&gt;", "&#65;", "&nbsp;", "&amp", "&bogus;",
             "<", ">", "</", "<!--x-->", "<!doctype html>", "<? pi ?>",
             "< notatag", "</ >", "a < b", "&", ";",
             # non-ASCII/odd whitespace right after a tag name: html.parser
             # absorbs it INTO the name (tagfind_tolerant) — the fast
             # scanner must decline, not match "<p\xa0>" as a <p>
             "<p\xa0>", "<script\xa0>x</script>", "<title\xa0>T</title>",
             "<p\x0b>", "<p\x00>", "</p\xa0>", "\xa0", " "]
        ),
        st.builds(lambda t: f"<{t}>", tags),
        st.builds(lambda t: f"</{t}>", tags),
        st.builds(lambda t: f"<{t}/>", tags),
        st.builds(lambda t, w: f'<{t} class="{w}">', tags, words),
        st.builds(lambda t, w: f"<{t} id={w}>", tags, words),
    )
    docs = st.lists(chunk, max_size=30).map("".join)

    @settings(max_examples=400, deadline=None)
    @given(docs)
    def check(doc):
        assert extract_text(doc) == extract_text_reference(doc)
        assert extract_title(doc) == extract_title_reference(doc)

    check()
