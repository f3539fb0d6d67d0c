"""Vocab tokenizer tests (functions/tokenize.py)."""

from __future__ import annotations

import pytest

from datax_spark.functions.tokenize import build_vocab, encode


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "the cat and the hat"),
            (1, "the cat sat"),
            (2, "rare unseen words"),
        ],
        "doc_id long, text string",
    )


def test_vocab_rank_order(docs):
    # counts: the=3, cat=2, and/hat/sat/rare/unseen/words=1 (alpha ties)
    v = {r["tok"]: r["token_id"] for r in build_vocab(docs, size=4).collect()}
    assert v == {"the": 0, "cat": 1, "and": 2, "hat": 3}


def test_min_freq_gate(docs):
    v = {r["tok"] for r in build_vocab(docs, size=10, min_freq=2).collect()}
    assert v == {"the", "cat"}


def test_encode_positions_and_oov(docs):
    vocab = build_vocab(docs, size=4)
    rows = encode(docs, vocab, vocab_size=4, oov_buckets=8).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["pos"]] = (r["token_id"], r["is_oov"])
    assert by_doc[0] == {0: (0, 0), 1: (1, 0), 2: (2, 0), 3: (0, 0), 4: (3, 0)}
    # doc 1: 'sat' is OOV → id in [4, 12), flagged
    sat_id, sat_oov = by_doc[1][2]
    assert sat_oov == 1 and 4 <= sat_id < 12
    # OOV ids are deterministic: re-encode agrees
    again = encode(docs, vocab, vocab_size=4, oov_buckets=8).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # all doc-2 tokens OOV and never collide with vocab ids
    assert all(t >= 4 and o == 1 for t, o in by_doc[2].values())


def test_oov_stable_under_vocab_growth(docs):
    """Feature-hashing contract: a token's OOV bucket never depends on
    the vocab contents — only crossing INTO the vocab changes its id."""
    small = encode(docs, build_vocab(docs, size=2), vocab_size=2, oov_buckets=8)
    big = encode(docs, build_vocab(docs, size=4), vocab_size=4, oov_buckets=8)
    s = {(r["doc_id"], r["pos"]): r for r in small.collect()}
    b = {(r["doc_id"], r["pos"]): r for r in big.collect()}
    for k in s:
        if s[k]["is_oov"] and b[k]["is_oov"]:
            assert s[k]["token_id"] - 2 == b[k]["token_id"] - 4  # same bucket
