"""Duplicate-span (exact substring) dedup — differential vs a pure-
python reference of the same keep-first-occurrence policy."""

from __future__ import annotations

from datax_spark.operators.span_dedup import (
    duplicate_span_stats,
    remove_duplicate_spans,
)

DOCS = [
    (0, "a b c d e f g h"),          # source of the span
    (1, "x y a b c d z w"),          # repeats window "a b c d"
    (2, "a b c d e q r s"),          # repeats two overlapping windows
    (3, "unique words only here"),   # clean
    (4, "short doc"),                # < n tokens: no windows
    (5, "a b c d a b c d"),          # internal repetition
]
N = 4


def _py_spans(docs, n):
    toks = {i: [t for t in s.split(" ") if t] for i, s in docs}
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for i, tk in toks.items():
        for p in range(len(tk) - n + 1):
            occ.setdefault(tuple(tk[p:p + n]), []).append((i, p))
    return toks, occ


def _py_stats(docs, n):
    toks, occ = _py_spans(docs, n)
    dup = {i: 0 for i in toks}
    for sites in occ.values():
        if len(sites) > 1:
            for i, _ in sites:
                dup[i] += 1
    out = {}
    for i, tk in toks.items():
        w = max(len(tk) - n + 1, 0)
        out[i] = (w, dup[i], round(dup[i] / w, 4) if w else 0.0)
    return out


def _py_remove(docs, n):
    toks, occ = _py_spans(docs, n)
    cut = {i: set() for i in toks}
    for sites in occ.values():
        if len(sites) > 1:
            keep = min(sites)
            for i, p in sites:
                if (i, p) != keep:
                    cut[i].update(range(p, p + n))
    out = {}
    for i, tk in toks.items():
        kept = [t for j, t in enumerate(tk) if j not in cut[i]]
        out[i] = (" ".join(kept), len(kept), len(tk) - len(kept))
    return out


def test_duplicate_span_stats_matches_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_frac"])
           for r in duplicate_span_stats(df, n=N).collect()}
    assert got == _py_stats(DOCS, N)
    assert got[4] == (0, 0, 0.0)  # short doc: a zero row, not absent
    assert got[3][1] == 0         # clean doc untouched
    assert got[5][1] > 0          # internal repetition counts too


def test_remove_duplicate_spans_matches_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["n_tokens_kept"], r["n_tokens_cut"])
           for r in remove_duplicate_spans(df, n=N).collect()}
    want = _py_remove(DOCS, N)
    assert got == want
    # the globally-first occurrence survives verbatim
    assert got[0][0] == "a b c d e f g h"
    # later occurrences lose exactly the covered tokens
    assert got[1][0] == "x y z w"
    # second-pass idempotence: a deduped corpus has nothing left to cut
    redo = spark.createDataFrame(
        [(i, t) for i, (t, _, _) in sorted(got.items())],
        "doc_id long, text string",
    )
    again = {r["doc_id"]: r["n_tokens_cut"]
             for r in remove_duplicate_spans(redo, n=N).collect()}
    assert set(again.values()) == {0}
