"""Property-based differentials for the corpus/text operators:
independent pure-python references executed against the Spark
implementations over hypothesis-generated inputs."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datax_spark.functions.text import dup_line_frac, top_ngram_frac
from datax_spark.functions.url import canonical_url
from datax_spark.operators.dedup import line_dedup

# ------------------------- pure-python references -------------------- #

_TRACKING = re.compile(r"^(utm_.*|gclid|fbclid|ref)$")
_URL = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)\??([^#]*)")


def py_canonical_url(url: str) -> str | None:
    m = _URL.match(re.sub(r"#.*$", "", url.strip()))
    if not m:
        return None
    scheme = m.group(1).lower()
    host = re.sub(r"^www\.", "", m.group(2).lower())
    if scheme == "http":
        host = re.sub(r":80$", "", host)
    elif scheme == "https":
        host = re.sub(r":443$", "", host)
    path = m.group(3) or "/"
    params = sorted(
        p
        for p in m.group(4).split("&")
        if p and not _TRACKING.match(p.split("=", 1)[0])
    )
    if not scheme or not host:
        return None
    q = "&".join(params)
    return f"{scheme}://{host}{path}" + (f"?{q}" if q else "")


def py_line_dedup(docs: dict[int, str]) -> dict[int, tuple[str, int, int]]:
    seen: set[str] = set()
    out: dict[int, tuple[str, int, int]] = {}
    for doc_id in sorted(docs):
        kept, dropped = [], 0
        for line in docs[doc_id].split("\n"):
            if not line.strip():
                continue
            h = hashlib.md5(line.encode()).hexdigest()
            if h in seen:
                dropped += 1
            else:
                seen.add(h)
                kept.append(line)
        if kept:
            out[doc_id] = ("\n".join(kept), len(kept), dropped)
    return out


def py_top_2gram_frac(text: str) -> float:
    toks = [t for t in text.split(" ") if t]
    grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    if not grams:
        return 0.0
    return round(Counter(grams).most_common(1)[0][1] / len(grams), 4)


def py_dup_line_frac(text: str) -> float:
    lines = [ln for ln in text.split("\n") if ln.strip()]
    if not lines:
        return 0.0
    return round(1 - len(set(lines)) / len(lines), 4)


# ------------------------------ strategies --------------------------- #

WORDS = ["the", "fox", "runs", "a", "b", "over", "data", "row"]
line_st = st.lists(st.sampled_from(WORDS), min_size=0, max_size=6).map(" ".join)
doc_st = st.lists(line_st, min_size=0, max_size=6).map("\n".join)

url_st = st.builds(
    lambda scheme, www, host, port, path, params, frag: (
        f"{scheme}://{'WWW.' if www else ''}{host}{port}{path}"
        + ("?" + "&".join(params) if params else "")
        + frag
    ),
    st.sampled_from(["http", "HTTPS", "https", "ftp"]),
    st.booleans(),
    st.sampled_from(["Example.com", "a.ORG", "sub.www.b.io"]),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.sampled_from(["", "/", "/p/q", "/x%20y"]),
    st.lists(
        st.sampled_from(["a=1", "b=2", "utm_source=x", "gclid=9", "ref=z", "z", ""]),
        max_size=4,
    ),
    st.sampled_from(["", "#frag", "#a#b"]),
)


# ------------------------------- tests ------------------------------- #


@settings(max_examples=12, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(st.lists(url_st, min_size=1, max_size=24))
def test_canonical_url_matches_python_reference(spark, urls):
    df = spark.createDataFrame(list(enumerate(urls)), "i long, url string")
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_url(F.col("url")).alias("c")).collect()
    }
    for i, u in enumerate(urls):
        assert got[i] == py_canonical_url(u), (u, got[i], py_canonical_url(u))


@settings(max_examples=12, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(st.lists(doc_st, min_size=1, max_size=10))
def test_line_dedup_matches_python_fold(spark, texts):
    docs = dict(enumerate(texts))
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_lines_kept"], r["n_lines_dropped"])
        for r in line_dedup(df).collect()
    }
    assert got == py_line_dedup(docs)


@settings(max_examples=12, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(st.lists(doc_st, min_size=1, max_size=12))
def test_repetition_signals_match_python(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["t"], r["d"])
        for r in df.select(
            "doc_id",
            top_ngram_frac(F.col("text")).alias("t"),
            dup_line_frac(F.col("text")).alias("d"),
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == (py_top_2gram_frac(t), py_dup_line_frac(t)), (i, t)
