"""BM25 top-k retrieval (operators/retrieval.py) — differential vs a
pure-python reference implementation of the same formula."""

from __future__ import annotations

import math
import re

from datax_spark.operators.retrieval import bm25_topk

DOCS = [
    (0, "spark merge window merge"),
    (1, "fast hash join hash hash"),
    (2, "slow scan, filter; vector"),
    (3, "window spark window fast"),
    (4, "the quick brown fox"),
    (5, ""),
]
QUERIES = [(0, "spark window"), (1, "hash JOIN fast"), (2, "absentterm")]


def _py_bm25(docs, queries, k=3, k1=1.2, b=0.75):
    tok = lambda s: [t for t in re.split("[^a-z0-9]+", s.lower()) if t]
    dtoks = {i: tok(t) for i, t in docs}
    n = len(dtoks)
    avgdl = sum(len(v) for v in dtoks.values()) / n
    out = {}
    for qid, q in queries:
        scores = {}
        for term in set(tok(q)):
            df = sum(1 for v in dtoks.values() if term in v)
            if not df:
                continue
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            for i, v in dtoks.items():
                tf = v.count(term)
                if tf:
                    dl = len(v)
                    scores[i] = scores.get(i, 0.0) + idf * tf * (k1 + 1) / (
                        tf + k1 * (1 - b + b * dl / avgdl)
                    )
        ranked = sorted(
            ((round(s, 4), i) for i, s in scores.items()),
            key=lambda t: (-t[0], t[1]),
        )
        out[qid] = [(i, s, r + 1) for r, (s, i) in enumerate(ranked[:k])]
    return out


def test_bm25_matches_python_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(QUERIES, "query_id long, query string")
    got: dict[int, list] = {}
    for r in bm25_topk(docs, queries, k=3).collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score"], r["rank"])
        )
    for qid in got:
        got[qid].sort(key=lambda t: t[2])
    want = _py_bm25(DOCS, QUERIES, k=3)
    assert got == {q: rows for q, rows in want.items() if rows}
    assert 2 not in got  # no shared term -> no rows, not score-0 rows


def test_bm25_plan_broadcasts_query_side(spark):
    """The corpus never shuffles on the query side: every join in the
    plan is a broadcast join (query terms, idf, stats) — the only
    exchanges are the two term aggregations and the final top-k."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(QUERIES, "query_id long, query string")
    plan = bm25_topk(docs, queries, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_tfidf_top_terms_semantics(spark):
    from datax_spark.operators.retrieval import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana shared"),
            (2, "banana cherry shared"),
            (3, "cherry cherry cherry shared"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, k=2).collect()
    top = {}
    for r in out:
        top.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["score"]))
    # rank 1 is each doc's signature term; 'shared' (df=N) scores 0 and
    # never beats a discriminative term
    assert sorted(top[1])[0][1] == "apple"
    assert sorted(top[3])[0][1] == "cherry"
    assert all(s >= 0 for ranks in top.values() for _, _, s in ranks)
    import math
    want = round(2 * math.log(3 / 1), 4)  # tf=2, df=1, N=3
    assert sorted(top[1])[0][2] == want
