"""Trigram substring index (operators/trigram_index.py): indexed LIKE
equals the honest scan, never misses, prunes."""

from __future__ import annotations

from datax_spark.operators.trigram_index import (
    like_search,
    pattern_grams,
    trigram_postings,
)


def _docs(spark):
    rows = [
        (1, "Merge Batch value table"),
        (2, "the batch merges rows"),
        (3, "no match here at all"),
        (4, "MERGE BATCH upper case"),
        (5, "me"),  # shorter than a gram
        (6, None),
        (7, "xmerge batchx embedded"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_indexed_equals_scan(spark):
    docs = _docs(spark)
    post = trigram_postings(docs)
    for pat in ("merge batch", "batch", "THE", "zzz", "e b"):
        got = _ids(like_search(docs, pat, postings=post))
        want = _ids(like_search(docs, pat))  # honest scan
        assert got == want, pat
    assert _ids(like_search(docs, "merge batch", postings=post)) == [1, 4, 7]


def test_short_pattern_falls_back_to_scan(spark):
    docs = _docs(spark)
    post = trigram_postings(docs)
    assert pattern_grams("me") == []
    assert _ids(like_search(docs, "me", postings=post)) == [1, 2, 4, 5, 7]


def test_short_and_null_texts_post_nothing(spark):
    docs = _docs(spark)
    post = trigram_postings(docs).collect()
    ids = {r["doc_id"] for r in post}
    assert 5 not in ids and 6 not in ids
    assert all(len(r["gram"]) == 3 for r in post)


def test_pruning_actually_prunes(spark):
    """Candidates after the gram intersection ≤ docs containing the
    rarest gram — doc 3 never reaches the verify for 'merge'."""
    docs = _docs(spark)
    post = trigram_postings(docs)
    grams = pattern_grams("merge")
    cand_ids = {
        r["doc_id"]
        for r in post.filter(post.gram.isin(grams)).collect()
    }
    assert 3 not in cand_ids


def test_persisted_index_matches_scan_and_adds_compose(spark, tmp_path):
    from datax_spark.operators.trigram_index import TrigramIndex

    a = _docs(spark)
    b = spark.createDataFrame(
        [(10, "late merge batch arrival"), (11, "unrelated doc")],
        "doc_id long, text string",
    )
    both = a.unionByName(b)

    idx = TrigramIndex.build(a, tmp_path / "tg", n_buckets=8)
    idx.add(b)
    one_shot = TrigramIndex.build(both, tmp_path / "tg2", n_buckets=8)
    for pat in ("merge batch", "batch", "zzz", "me"):
        via_adds = _ids(idx.search(both, pat))
        assert via_adds == _ids(one_shot.search(both, pat)), pat
        assert via_adds == _ids(like_search(both, pat)), pat
    assert _ids(idx.search(both, "merge batch")) == [1, 4, 7, 10]

    import pytest as _p

    with _p.raises(FileNotFoundError):
        TrigramIndex(spark, tmp_path / "nope")
