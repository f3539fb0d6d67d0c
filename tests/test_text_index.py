"""Persisted BM25 inverted index: probe == one-shot bm25_topk row for
row, incremental adds == one-shot over the union, probes partition-
prune to the query terms' buckets, and the artifact survives a reload.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datax_spark.operators.retrieval import bm25_topk
from datax_spark.operators.text_index import Bm25Index

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a quick brown dog outpaces a lazy fox"),
    (2, "spark shuffles data between executors"),
    (3, "the fox eats quick snacks"),
    (4, "executors spill data to disk under memory pressure"),
    (5, "lazy evaluation defers the shuffle"),
    (6, "brown bread and quick oats"),
    (7, "dogs and foxes are canids"),
]
QUERIES = [(0, "quick brown fox"), (1, "spark shuffle data"), (2, "lazy dog")]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture()
def queries(spark):
    return spark.createDataFrame(QUERIES, "query_id long, query string")


def _rows(df):
    return sorted(
        (r["query_id"], r["doc_id"], r["score"], r["rank"]) for r in df.collect()
    )


def test_probe_equals_one_shot(spark, tmp_path, docs, queries):
    idx = Bm25Index.build(docs, tmp_path / "idx", n_buckets=8)
    got = _rows(idx.probe(queries, k=3))
    want = _rows(bm25_topk(docs, queries, k=3))
    assert got == want and len(got) > 0


def test_incremental_adds_equal_one_shot(spark, tmp_path, docs, queries):
    first = docs.filter(F.col("doc_id") < 5)
    rest = docs.filter(F.col("doc_id") >= 5)
    idx = Bm25Index.build(first, tmp_path / "idx", n_buckets=8)
    assert idx.add(rest) == 3
    got = _rows(idx.probe(queries, k=3))
    want = _rows(bm25_topk(docs, queries, k=3))
    assert got == want
    # stats grew additively
    assert idx.meta["n_docs"] == 8


def test_reload_from_disk(spark, tmp_path, docs, queries):
    Bm25Index.build(docs, tmp_path / "idx", n_buckets=8)
    idx = Bm25Index(spark, tmp_path / "idx")
    assert _rows(idx.probe(queries, k=3)) == _rows(bm25_topk(docs, queries, k=3))


def test_probe_prunes_to_query_buckets(spark, tmp_path, docs, queries):
    """The postings scan must carry a bucket partition filter — the
    serving cost tracks the query's terms, not the corpus."""
    idx = Bm25Index.build(docs, tmp_path / "idx", n_buckets=64)
    q = idx.probe(queries.limit(1), k=3)
    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted"
    )
    part_lines = [
        ln for ln in plan.splitlines() if "PartitionFilters" in ln
    ]
    assert part_lines and any("bucket" in ln for ln in part_lines), plan
    # and with 64 buckets, a 3-term query reads far fewer than all dirs
    probed = {
        r["bucket"]
        for r in idx.postings(None)
        .select("bucket")
        .distinct()
        .collect()
    }
    assert len(probed) > 3  # corpus spreads over many buckets


def test_bad_format_and_missing_index(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        Bm25Index(spark, tmp_path / "nope")


def test_empty_query_terms(spark, tmp_path, docs):
    """A query with no alnum tokens yields no rows (not a crash)."""
    idx = Bm25Index.build(docs, tmp_path / "idx", n_buckets=8)
    q = docs.sparkSession.createDataFrame(
        [(9, "!!! ???")], "query_id long, query string"
    )
    assert idx.probe(q, k=3).count() == 0


# ---------- CDC-maintained index (v2: segments + tombstones) ---------- #

EVENT_SCHEMA = "url string, doc_id long, text string, op string, lsn long"


def _mk_table(spark, path):
    from pyspark.sql import types as T

    from datax_spark.icetable.table import IceTable

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    t = IceTable.create(spark, path, schema, num_partitions=2, key_column="url")
    t.bulk_overwrite(
        spark.createDataFrame(
            [(f"u{i}", i, txt) for i, txt in DOCS],
            "url string, doc_id long, text string",
        ),
        epoch=0,
    )
    return t


def _one_shot(spark, table, tmp_path, tag):
    return Bm25Index.build(
        table.read().select("doc_id", "text"), tmp_path / f"oneshot-{tag}",
        n_buckets=8,
    )


def test_sync_matches_rebuild_across_iud_epochs(spark, tmp_path, queries):
    """The maintained index is a CDC consumer: after arbitrary
    insert/update/delete epochs through the REAL merge path, sync()
    makes probe() row-identical to an index rebuilt one-shot from the
    table's current state — including delete-then-reinsert and repeated
    updates of one key — and the global stats stay exact."""
    from datax_spark.operators.merge import apply_epoch

    t = _mk_table(spark, tmp_path / "t")
    idx = Bm25Index.build_from_table(
        t, tmp_path / "idx", n_buckets=8, id_col="doc_id"
    )

    apply_epoch(
        t,
        spark.createDataFrame(
            [
                ("u0", 0, DOCS[0][1] + " refreshed crawl section", "U", 10),
                ("u3", 3, None, "D", 11),
                ("u8", 8, "fresh spark document about shuffle data", "I", 12),
            ],
            EVENT_SCHEMA,
        ),
        epoch=1,
        extract=False,
    )
    out = idx.sync(t)
    assert out["removed"] == 2 and out["added"] == 2  # D + UB, I + UA
    want = _one_shot(spark, t, tmp_path, "a")
    assert _rows(idx.probe(queries, k=4)) == _rows(want.probe(queries, k=4))
    assert idx.meta["n_docs"] == want.meta["n_docs"] == 8
    assert idx.meta["sum_dl"] == want.meta["sum_dl"]

    # churn again: reinsert a deleted key, delete the fresh one, update
    # u0 a second time (its first-generation tombstone must not shadow
    # the second re-add)
    apply_epoch(
        t,
        spark.createDataFrame(
            [
                ("u3", 3, "the fox returns with quick brown snacks", "I", 20),
                ("u8", 8, None, "D", 21),
                ("u0", 0, "a dog and a fox share lazy afternoons", "U", 22),
            ],
            EVENT_SCHEMA,
        ),
        epoch=2,
        extract=False,
    )
    assert idx.sync(t)["removed"] == 2
    want = _one_shot(spark, t, tmp_path, "b")
    assert _rows(idx.probe(queries, k=4)) == _rows(want.probe(queries, k=4))
    assert idx.meta["n_docs"] == want.meta["n_docs"]
    assert idx.meta["sum_dl"] == want.meta["sum_dl"]

    # idempotent no-op when the cursor is current
    assert idx.sync(t) == {
        "removed": 0, "added": 0,
        "from": t.current_version(), "to": t.current_version(),
    }


def test_compact_folds_tombstones(spark, tmp_path, queries):
    """compact() drops dead generations and clears the tombstone log
    without changing any probe result; a post-compact sync still
    works."""
    from datax_spark.operators.merge import apply_epoch

    t = _mk_table(spark, tmp_path / "t")
    idx = Bm25Index.build_from_table(
        t, tmp_path / "idx", n_buckets=8, id_col="doc_id"
    )
    apply_epoch(
        t,
        spark.createDataFrame(
            [("u1", 1, "an updated dog document", "U", 10),
             ("u5", 5, None, "D", 11)],
            EVENT_SCHEMA,
        ),
        epoch=1,
        extract=False,
    )
    idx.sync(t)
    before = _rows(idx.probe(queries, k=4))
    idx.compact()
    assert not (tmp_path / "idx" / "tombstones").exists()
    assert _rows(idx.probe(queries, k=4)) == before
    # dead rows physically gone: live count == postings count
    assert idx.postings(None).count() == idx._live_postings(None).count()

    apply_epoch(
        t,
        spark.createDataFrame(
            [("u2", 2, "executors shuffle quick data", "U", 20)], EVENT_SCHEMA
        ),
        epoch=2,
        extract=False,
    )
    idx.sync(t)
    want = _one_shot(spark, t, tmp_path, "c")
    assert _rows(idx.probe(queries, k=4)) == _rows(want.probe(queries, k=4))


def test_compact_crash_window_leaves_index_readable(
    spark, tmp_path, docs, queries
):
    """compact() publishes via the meta commit point: a crash after the
    folded rows are staged but before the meta rename must leave the
    OLD postings fully readable (the earlier two-rename swap had a
    window with no postings dir at all). Simulated by dropping an
    orphan staged generation next to a live index: reopen reads the
    committed dir, a real compact then publishes a new generation and
    GCs every unreferenced dir."""
    idx = Bm25Index.build(docs, tmp_path / "idx", n_buckets=8)
    before = _rows(idx.probe(queries, k=4))
    committed = idx._data_dir().name

    # orphan staged dir = what a crash mid-compact leaves behind
    import shutil

    shutil.copytree(idx._data_dir(), tmp_path / "idx" / "postings-g7")

    re = Bm25Index(spark, tmp_path / "idx")
    assert re._data_dir().name == committed  # orphan invisible
    assert _rows(re.probe(queries, k=4)) == before

    re.compact()
    assert _rows(re.probe(queries, k=4)) == before
    dirs = {
        p.name for p in (tmp_path / "idx").iterdir()
        if p.is_dir() and (
            p.name == "postings" or p.name.startswith("postings-g")
        )
    }
    assert dirs == {re.meta["data_dir"]}  # orphan + old gen GC'd


def test_crashed_transaction_is_invisible_and_retry_converges(
    spark, tmp_path, docs, queries
):
    """meta.json is the commit point: a transaction that wrote its
    segment and tombstones but died before the meta publish changes NO
    probe result, and re-running the same transaction converges (the
    retry dynamic-overwrites the orphan segment; replayed tombstones
    fold idempotently)."""
    idx = Bm25Index.build(docs, tmp_path / "idx", n_buckets=8)
    meta_bytes = (tmp_path / "idx" / "meta.json").read_bytes()
    baseline = _rows(idx.probe(queries, k=4))

    removed = docs.filter(F.col("doc_id") == 0)
    added = spark.createDataFrame(
        [(0, "the slow red fox naps"), (9, "brand new quick corpus entry")],
        "doc_id long, text string",
    )
    idx.apply_changes(removed, added)

    # "crash before commit": restore the old meta, reload
    (tmp_path / "idx" / "meta.json").write_bytes(meta_bytes)
    crashed = Bm25Index(spark, tmp_path / "idx")
    assert _rows(crashed.probe(queries, k=4)) == baseline

    # retry the SAME transaction on the crashed index
    crashed.apply_changes(removed, added)
    final_docs = docs.filter(F.col("doc_id") != 0).unionByName(added)
    want = Bm25Index.build(final_docs, tmp_path / "want", n_buckets=8)
    assert _rows(crashed.probe(queries, k=4)) == _rows(want.probe(queries, k=4))
    assert crashed.meta["n_docs"] == want.meta["n_docs"]
    assert crashed.meta["sum_dl"] == want.meta["sum_dl"]


def test_sync_requires_matching_table(spark, tmp_path, docs):
    idx = Bm25Index.build(docs, tmp_path / "idx", n_buckets=8)
    with pytest.raises(ValueError, match="no cursor"):
        idx.sync(object())


# -------- property: sync ≡ one-shot under ANY I/U/D/compact history -------- #

from hypothesis import HealthCheck, given
from hypothesis import settings as hsettings
from hypothesis import strategies as st

_KEYS = ["a", "b", "c", "d", "e"]
_WORDS = ["quick brown fox", "lazy dog naps", "spark shuffle data",
          "parquet column scan", "fox and dog tales"]

_op = st.one_of(
    st.dictionaries(st.sampled_from(_KEYS), st.integers(0, 4),
                    min_size=1, max_size=3),          # upserts: key -> text id
    st.sets(st.sampled_from(_KEYS), min_size=1, max_size=2),  # deletes
    st.just("C"),                                      # index compact
)


@hsettings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=1, max_size=5))
def test_sync_equals_one_shot_property(spark, tmp_path_factory, ops, queries):
    """Differential: for ANY sequence of upsert/delete epochs through
    the real merge path, interleaved with index compactions, the synced
    index's probe AND its global stats equal a one-shot rebuild at
    every step's end state. Derandomized: green means green."""
    from pyspark.sql import types as T

    from datax_spark.icetable.table import IceTable
    from datax_spark.operators.merge import apply_epoch

    base = tmp_path_factory.mktemp("bm25_prop")
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    t = IceTable.create(spark, base / "t", schema, num_partitions=2,
                        key_column="url")
    idx = Bm25Index.build_from_table(t, base / "idx", n_buckets=8,
                                     id_col="doc_id")
    model: dict[str, int] = {}
    lsn = 0
    epoch = 0
    for op in ops:
        if op == "C":
            idx.compact()
            continue
        if isinstance(op, dict):
            lsn += 1
            rows = [
                (k, _KEYS.index(k),
                 f"{_WORDS[v]} about {k}",
                 "U" if k in model else "I", lsn)
                for k, v in sorted(op.items())
            ]
            model.update({k: v for k, v in op.items()})
        else:
            present = sorted(k for k in op if k in model)
            if not present:
                continue
            lsn += 1
            rows = [(k, _KEYS.index(k), None, "D", lsn) for k in present]
            for k in present:
                del model[k]
        apply_epoch(
            t,
            spark.createDataFrame(
                rows,
                "url string, doc_id long, text string, op string, lsn long",
            ),
            epoch=epoch,
            extract=False,
        )
        epoch += 1
        idx.sync(t)

    idx.sync(t)  # cursor current: no-op
    want = Bm25Index.build(
        t.read().select("doc_id", "text"), base / "want", n_buckets=8
    )
    assert idx.meta["n_docs"] == want.meta["n_docs"] == len(model)
    assert idx.meta["sum_dl"] == want.meta["sum_dl"]
    assert _rows(idx.probe(queries, k=5)) == _rows(want.probe(queries, k=5))


def test_predicate_scoped_sync(spark, tmp_path, queries):
    """A where-scoped index (lang = 'en' serving shape): updates that
    move a doc ACROSS the predicate boundary become index inserts/
    deletes, stats stay exact, and the synced index equals a one-shot
    rebuild over the filtered corpus."""
    from pyspark.sql import types as T

    from datax_spark.icetable.table import IceTable
    from datax_spark.operators.merge import apply_epoch

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    t = IceTable.create(
        spark, tmp_path / "t", schema, num_partitions=2, key_column="url"
    )
    t.bulk_overwrite(
        spark.createDataFrame(
            [(f"u{i}", i, txt, "en" if i % 2 == 0 else "de")
             for i, txt in DOCS],
            schema,
        ),
        epoch=0,
    )
    idx = Bm25Index.build_from_table(
        t, tmp_path / "idx", n_buckets=8, id_col="doc_id",
        where="lang = 'en'",
    )
    assert idx.meta["n_docs"] == 4  # even doc_ids only

    ev = "url string, doc_id long, text string, lang string, op string, lsn long"
    apply_epoch(
        t,
        spark.createDataFrame(
            [
                # doc 1 (de) becomes en: index INSERT
                ("u1", 1, DOCS[1][1], "en", "U", 10),
                # doc 2 (en) becomes de: index DELETE
                ("u2", 2, DOCS[2][1], "de", "U", 11),
                # doc 0 stays en with new text: tombstone + re-add
                ("u0", 0, "quick red fox revisited", "en", "U", 12),
                # doc 5 (de) updated within de: index no-op
                ("u5", 5, "noch ein text", "de", "U", 13),
            ],
            ev,
        ),
        epoch=1,
        extract=False,
    )
    out = idx.sync(t)
    assert out["removed"] == 2 and out["added"] == 2  # u2+u0 out, u1+u0 in

    want = Bm25Index.build(
        t.read().filter("lang = 'en'").select("doc_id", "text"),
        tmp_path / "want", n_buckets=8,
    )
    assert idx.meta["n_docs"] == want.meta["n_docs"] == 4
    assert idx.meta["sum_dl"] == want.meta["sum_dl"]
    assert _rows(idx.probe(queries, k=4)) == _rows(want.probe(queries, k=4))


def test_purge_ids_physical_erasure(spark, tmp_path, docs, queries):
    """Index-side right-to-be-forgotten: after purge_ids, NO posting
    row for the doc survives on disk (physical, not masked), the
    global stats match a one-shot rebuild without the doc, and probes
    agree. Works without any changelog pre-image — the table's own
    purge destroys those."""
    idx = Bm25Index.build(docs, tmp_path / "idx", n_buckets=8)
    assert idx.purge_ids([0, 99]) == {"purged": 1}  # 99 never existed
    assert not (tmp_path / "idx" / "tombstones").exists()
    # physical: the raw postings dir holds nothing for doc 0
    assert idx.postings(None).filter(F.col("doc_id") == 0).count() == 0
    want = Bm25Index.build(
        docs.filter(F.col("doc_id") != 0), tmp_path / "want", n_buckets=8
    )
    assert idx.meta["n_docs"] == want.meta["n_docs"]
    assert idx.meta["sum_dl"] == want.meta["sum_dl"]
    assert _rows(idx.probe(queries, k=4)) == _rows(want.probe(queries, k=4))
