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


def test_sync_matches_rebuild_and_compact(spark, tmp_path):
    """The persisted trigram index is a CDC consumer: after I/U/D
    epochs through the real merge path, sync() makes search() —
    AND its candidate pruning — equal a one-shot rebuild on the
    table's current state; compact() folds the tombstones without
    changing results."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from datax_spark.icetable.table import IceTable
    from datax_spark.operators.merge import apply_epoch
    from datax_spark.operators.trigram_index import TrigramIndex

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    t = IceTable.create(
        spark, tmp_path / "t", schema, num_partitions=2, key_column="url"
    )
    t.bulk_overwrite(
        spark.createDataFrame(
            [(f"u{i}", i, txt) for i, txt in [
                (1, "Merge Batch value table"),
                (2, "the batch merges rows"),
                (3, "no match here at all"),
                (4, "MERGE BATCH upper case"),
            ]],
            schema,
        ),
        epoch=0,
    )
    idx = TrigramIndex.build_from_table(
        t, tmp_path / "idx", n_buckets=8, id_col="doc_id"
    )
    # update doc 1 so it STOPS matching, delete doc 4 (matched), insert
    # doc 8 that matches
    apply_epoch(
        t,
        spark.createDataFrame(
            [
                ("u1", 1, "now entirely different words", "U", 10),
                ("u4", 4, None, "D", 11),
                ("u8", 8, "fresh merge batch arrival", "I", 12),
            ],
            "url string, doc_id long, text string, op string, lsn long",
        ),
        epoch=1,
        extract=False,
    )
    out = idx.sync(t)
    assert out["removed"] == 2 and out["added"] == 2
    docs = t.read().select("doc_id", "text")
    assert _ids(idx.search(docs, "merge batch")) == [8]

    # candidate-level equivalence with a one-shot rebuild: the updated
    # doc's OLD grams must not make it a candidate
    want = TrigramIndex.build(docs, tmp_path / "want", n_buckets=8)
    from datax_spark.operators.trigram_index import pattern_grams as pg

    def _cands(i, pat):
        g = spark.createDataFrame([(x,) for x in pg(pat)], "gram string")
        return sorted(
            r["doc_id"]
            for r in i._live_postings(None)
            .join(F.broadcast(g), "gram")
            .select("doc_id", "gram")
            .distinct()
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") == len(pg(pat)))
            .collect()
        )

    assert _cands(idx, "merge batch") == _cands(want, "merge batch")

    before = _ids(idx.search(docs, "merge batch"))
    idx.compact()
    assert not (tmp_path / "idx" / "tombstones").exists()
    assert _ids(idx.search(docs, "merge batch")) == before
    # cursor no-op
    assert idx.sync(t)["added"] == 0


def test_purge_ids_erases_grams(spark, tmp_path):
    from datax_spark.operators.trigram_index import TrigramIndex
    from pyspark.sql import functions as F

    docs = _docs(spark)
    idx = TrigramIndex.build(docs, tmp_path / "idx", n_buckets=8)
    assert idx.purge_ids([1]) == {"purged": 1}
    post = idx._live_postings(None)
    assert post.filter(F.col("doc_id") == 1).count() == 0
    assert not (tmp_path / "idx" / "tombstones").exists()
    # results equal search over the corpus minus the purged doc
    assert _ids(idx.search(docs, "merge batch")) == [4, 7]
    # erasure count reports ids actually LIVE in the index: absent and
    # already-purged ids contribute 0 (the compliance-trail contract
    # Bm25Index/IvfIndex follow — the old code counted the request)
    assert idx.purge_ids([1, 999]) == {"purged": 0}
    assert idx.purge_ids([2, 999]) == {"purged": 1}


def test_multi_pattern_search_equals_per_pattern_scans(spark):
    """N patterns in one pruned pass == N honest scans, including a
    sub-3-char pattern on the fallback path and a pattern matching
    nothing."""
    from datax_spark.operators.trigram_index import (
        multi_like_search,
        trigram_postings,
    )

    docs = _docs(spark)
    pats = {0: "merge batch", 1: "THE", 2: "zzz", 3: "me"}
    got = {
        (r["pattern_id"], r["doc_id"])
        for r in multi_like_search(
            docs, pats, postings=trigram_postings(docs)
        ).collect()
    }
    want = set()
    for pid, p in pats.items():
        for r in like_search(docs, p).collect():
            want.add((pid, r["doc_id"]))
    assert got == want and (0, 1) in got and not any(p == 2 for p, _ in got)
