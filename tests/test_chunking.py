"""Chunking & packing (operators/chunking.py): window math and
budget-cut semantics on hand-computed inputs."""

from __future__ import annotations

import pytest

from datax_spark.operators.chunking import chunk_documents, pack_documents


def _doc(n):  # n tokens "t0 t1 ..."
    return " ".join(f"t{i}" for i in range(n))


def test_chunk_windows_and_overlap(spark):
    df = spark.createDataFrame(
        [(0, _doc(10)), (1, _doc(25)), (2, _doc(3)), (3, "")],
        "doc_id long, text string",
    )
    rows = chunk_documents(df, chunk_tokens=10, overlap=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: exactly one window (start 6 would be pure overlap -> dropped)
    assert [r["n_chunk_tokens"] for r in sorted(by_doc[0], key=lambda r: r["chunk_idx"])] == [10]
    # doc 1 (25 tokens, step 6): starts 0,6,12,18 -> sizes 10,10,10,7;
    # start 24 would be 1 token inside the overlap region -> dropped
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["n_chunk_tokens"] for r in c1] == [10, 10, 10, 7]
    # consecutive windows overlap by 4 tokens
    assert c1[0]["chunk_text"].split()[-4:] == c1[1]["chunk_text"].split()[:4]
    # short doc -> one whole-doc chunk; empty doc -> nothing
    assert [r["chunk_text"] for r in by_doc[2]] == [_doc(3)]
    assert 3 not in by_doc
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=10, overlap=10)


def test_pack_budget_cuts(spark):
    rows = [
        (1, "a", 100), (2, "a", 100), (3, "a", 150), (4, "a", 100),
        (10, "b", 500),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    got = {
        (r["source"], r["pack_id"]): (r["n_docs"], r["n_tokens"], r["first_doc"], r["last_doc"])
        for r in pack_documents(df, context_tokens=250).collect()
    }
    # a: doc1 (before=0 -> pack0), doc2 (before=100 -> pack0),
    #    doc3 (before=200 -> pack0!), doc4 (before=350 -> pack1)
    assert got[("a", 0)] == (3, 350, 1, 3)
    assert got[("a", 1)] == (1, 100, 4, 4)
    # b: one oversized doc -> its own pack 0
    assert got[("b", 0)] == (1, 500, 10, 10)
