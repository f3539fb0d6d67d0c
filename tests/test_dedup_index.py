"""Incremental MinHash index tests (operators/dedup_index.py).

The load-bearing property: the union of add() outputs over ANY batch
split equals the one-shot minhash_lsh_pairs over the full corpus.
"""

from __future__ import annotations

import pytest

from datax_spark.operators.dedup import minhash_lsh_pairs
from datax_spark.operators.dedup_index import MinHashIndex

BASE = "the quick brown fox jumps over the lazy dog near the river bank today"
NEAR = "the quick brown fox jumps over the lazy dog near the river bank tonight"
OTHER = "completely different content about spark shuffles and parquet files here"


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (0, BASE),
            (1, BASE),   # exact dup of 0 (same batch under even/odd split)
            (2, NEAR),   # near dup of 0, lands in the even batch
            (3, NEAR + " again"),  # near dup crossing into the odd batch
            (4, OTHER),
            (5, BASE),   # exact dup of 0 ACROSS batches (odd batch)
            (6, "short unrelated text with few words only"),
            (7, OTHER),  # exact dup of 4 across batches
        ],
        "doc_id long, text string",
    )


def _pairs(df) -> dict:
    return {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in df.collect()}


def test_union_of_adds_equals_one_shot(spark, corpus, tmp_path):
    one_shot = _pairs(minhash_lsh_pairs(corpus, jaccard_threshold=0.7))
    idx = MinHashIndex.create(spark, tmp_path / "idx", jaccard_threshold=0.7)
    got: dict = {}
    for parity in (0, 1):
        batch = corpus.filter(f"doc_id % 2 = {parity}")
        out = _pairs(idx.add(batch))
        assert not set(out) & set(got)  # each pair found exactly once
        got.update(out)
    assert got == one_shot
    assert (0, 5) in got and got[(0, 5)] == 1.0  # cross-batch exact dup
    assert (4, 7) in got and got[(4, 7)] == 1.0


def test_three_way_split_same_result(spark, corpus, tmp_path):
    one_shot = _pairs(minhash_lsh_pairs(corpus, jaccard_threshold=0.7))
    idx = MinHashIndex.create(spark, tmp_path / "idx3", jaccard_threshold=0.7)
    got: dict = {}
    for m in (0, 1, 2):
        out = _pairs(idx.add(corpus.filter(f"doc_id % 3 = {m}")))
        assert not set(out) & set(got)
        got.update(out)
    assert got == one_shot


def test_load_roundtrip_and_format_guard(spark, corpus, tmp_path):
    path = tmp_path / "idx_rt"
    idx = MinHashIndex.create(spark, path, jaccard_threshold=0.7)
    idx.add(corpus.filter("doc_id < 4"))
    re = MinHashIndex.load(spark, path)
    assert re.meta["batches"] == [0]
    out = _pairs(re.add(corpus.filter("doc_id >= 4")))
    assert (0, 5) in out  # probe sees the pre-reload batch

    import json
    meta = json.loads((path / "meta.json").read_text())
    meta["format_version"] = 99
    (path / "meta.json").write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="format 99"):
        MinHashIndex.load(spark, path)


def test_bands_must_divide_k(spark, tmp_path):
    with pytest.raises(ValueError, match="must divide"):
        MinHashIndex.create(spark, tmp_path / "bad", k=8, bands=3)


def test_create_refuses_existing_index(spark, corpus, tmp_path):
    path = tmp_path / "idx_guard"
    MinHashIndex.create(spark, path)
    with pytest.raises(FileExistsError, match="already exists"):
        MinHashIndex.create(spark, path)


def test_crashed_add_recovers(spark, corpus, tmp_path):
    """A batch dir written by an add() that died before committing meta
    is an orphan — the NEXT add() under the same number replaces it and
    the result still equals the one-shot pairs."""
    path = tmp_path / "idx_crash"
    idx = MinHashIndex.create(spark, path, jaccard_threshold=0.7)
    half1, half2 = corpus.filter("doc_id % 2 = 0"), corpus.filter("doc_id % 2 = 1")
    got = _pairs(idx.add(half1))
    # simulate a crashed second add: data dirs exist, meta not updated
    import shutil
    for kind in ("sigs", "buckets", "members"):
        shutil.copytree(path / kind / "batch=0", path / kind / "batch=1")
    re = MinHashIndex.load(spark, path)
    assert re.meta["batches"] == [0]
    got.update(_pairs(re.add(half2)))  # overwrites the orphan batch=1
    assert got == _pairs(minhash_lsh_pairs(corpus, jaccard_threshold=0.7))


# ---------- removals + CDC sync (generation-scoped tombstones) ---------- #


def test_remove_kills_pairs_and_readd_is_live(spark, corpus, tmp_path):
    """A removed doc stops pairing in every later probe; a later re-add
    of the same id pairs again (tombstones are generation-scoped, not
    forever)."""
    from pyspark.sql import functions as F

    idx = MinHashIndex.create(spark, tmp_path / "idx", k=8, bands=4,
                              jaccard_threshold=0.5)
    idx.add(corpus.filter(F.col("doc_id").isin(0, 4, 6)))
    assert idx.remove(
        spark.createDataFrame([(0,)], "doc_id long")
    ) == 1
    # doc 1 is an exact dup of removed doc 0 — no pair now
    got = _pairs(idx.add(corpus.filter(F.col("doc_id") == 1)))
    assert got == {}
    # re-add id 0: pairs against the live doc 1 again
    got = _pairs(idx.add(corpus.filter(F.col("doc_id") == 0)))
    assert (0, 1) in got and got[(0, 1)] == 1.0


def test_sync_emits_exactly_the_changed_docs_pairs(spark, tmp_path):
    """sync(table) == the one-shot pairs over the LIVE corpus that
    involve at least one doc changed in the span: an update that makes
    a doc a near-dup pairs it; deleting one endpoint of a dup pair goes
    silent; the updated doc never pairs against its own old
    generation."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from datax_spark.icetable.table import IceTable
    from datax_spark.operators.merge import apply_epoch

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
            [("u0", 0, BASE), ("u4", 4, OTHER), ("u6", 6, BASE + " x")],
            schema,
        ),
        epoch=0,
    )
    idx, seed_pairs = MinHashIndex.create_from_table(
        spark, t, tmp_path / "idx", k=8, bands=4, jaccard_threshold=0.5
    )
    assert (0, 6) in _pairs(seed_pairs)  # initial near-dup found

    # epoch 1: update doc 4 to be a dup of 0; delete doc 6; insert 9
    # as another copy of BASE
    apply_epoch(
        t,
        spark.createDataFrame(
            [
                ("u4", 4, BASE + " now", "U", 10),
                ("u6", 6, None, "D", 11),
                ("u9", 9, BASE, "I", 12),
            ],
            "url string, doc_id long, text string, op string, lsn long",
        ),
        epoch=1,
        extract=False,
    )
    got = _pairs(idx.sync(t))
    # one-shot over live corpus {0:BASE, 4:BASE+' now', 9:BASE},
    # changed docs {4, 9}: pairs (0,4), (0,9), (4,9); nothing with the
    # deleted doc 6, and doc 4 must not pair its own old generation
    assert set(got) == {(0, 4), (0, 9), (4, 9)}, got
    # cursor no-op
    assert idx.sync(t).count() == 0

    # epoch 2: delete doc 0 — future inserts of identical text pair
    # only against the surviving copies
    apply_epoch(
        t,
        spark.createDataFrame(
            [("u0", 0, None, "D", 20)],
            "url string, doc_id long, text string, op string, lsn long",
        ),
        epoch=2,
        extract=False,
    )
    assert idx.sync(t).count() == 0  # a removal alone adds no pairs
    apply_epoch(
        t,
        spark.createDataFrame(
            [("u10", 10, BASE, "I", 30)],
            "url string, doc_id long, text string, op string, lsn long",
        ),
        epoch=3,
        extract=False,
    )
    got = _pairs(idx.sync(t))
    assert set(got) == {(4, 10), (9, 10)}, got


def test_noop_sync_schema_matches_string_ids(spark, tmp_path):
    """The no-op span's empty frame types id_a/id_b like the CORPUS id
    column (here string urls) — a hardcoded long schema breaks
    unionByName/append for consumers accumulating sync outputs."""
    from pyspark.sql import types as T

    from datax_spark.icetable.table import IceTable

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("text", T.StringType()),
    ])
    t = IceTable.create(
        spark, tmp_path / "t", schema, num_partitions=2, key_column="url"
    )
    t.bulk_overwrite(
        spark.createDataFrame([("u0", BASE), ("u1", OTHER)], schema), epoch=0
    )
    idx, _ = MinHashIndex.create_from_table(
        spark, t, tmp_path / "idx", k=8, bands=4, jaccard_threshold=0.5,
        id_col="url",
    )
    noop = idx.sync(t)  # cursor already current → empty frame
    assert noop.count() == 0
    types = {f.name: f.dataType for f in noop.schema.fields}
    assert types["id_a"] == T.StringType()
    assert types["id_b"] == T.StringType()


def test_compact_folds_batches_and_tombstones(spark, corpus, tmp_path):
    """compact() collapses the batch chain to one live batch: dead
    members gone, dead signature CLASSES gone (no residual candidate
    work), results unchanged, and the index keeps accepting adds and
    removals afterwards."""
    from pyspark.sql import functions as F

    idx = MinHashIndex.create(spark, tmp_path / "idx", k=8, bands=4,
                              jaccard_threshold=0.5)
    idx.add(corpus.filter(F.col("doc_id").isin(0, 4)))
    idx.add(corpus.filter(F.col("doc_id").isin(1, 6)))
    idx.remove(spark.createDataFrame([(0,)], "doc_id long"))
    out = idx.compact()
    assert out == {"batches": 1, "members": 3}
    assert idx.meta["batches"] == [2] and idx.meta["tombstone_batches"] == []
    # doc 0's signature class had no other member: fully gone
    sigs = idx._read_committed("sigs")
    members = idx._read_committed("members")
    assert members.filter(F.col("doc_id") == 0).count() == 0
    assert sigs.join(members, "_sig", "left_anti").count() == 0
    # behavior preserved: doc 5 (copy of BASE) pairs with live doc 1,
    # not the compacted-away doc 0
    got = _pairs(idx.add(corpus.filter(F.col("doc_id") == 5)))
    assert (1, 5) in got and not any(0 in p for p in got)


def test_purge_ids_erases_fingerprints(spark, corpus, tmp_path):
    """After purge_ids, no signature/membership/bucket row of the id
    survives on disk, and a re-added identical doc pairs only with the
    remaining copies."""
    from pyspark.sql import functions as F

    idx = MinHashIndex.create(spark, tmp_path / "idx", k=8, bands=4,
                              jaccard_threshold=0.5)
    idx.add(corpus.filter(F.col("doc_id").isin(0, 1, 4)))
    assert idx.purge_ids([0]) == {"purged": 1}
    members = idx._read_committed("members")
    assert members.filter(F.col("doc_id") == 0).count() == 0
    got = _pairs(idx.add(corpus.filter(F.col("doc_id") == 5)))
    assert (1, 5) in got and not any(0 in p for p in got)


# ------ property: sync pairs ≡ one-shot restricted to changed docs ------ #

from hypothesis import HealthCheck, given
from hypothesis import settings as hsettings
from hypothesis import strategies as st

_KEYS = ["a", "b", "c", "d"]
_TEXTS = [BASE, NEAR, OTHER, BASE + " coda"]

_op = st.one_of(
    st.dictionaries(st.sampled_from(_KEYS), st.integers(0, 3),
                    min_size=1, max_size=2),   # upserts: key -> text id
    st.sets(st.sampled_from(_KEYS), min_size=1, max_size=2),  # deletes
    st.just("C"),                               # index compact
)


@hsettings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=1, max_size=4))
def test_sync_pairs_equal_one_shot_property(spark, tmp_path_factory, ops):
    """Differential: after EVERY sync in ANY upsert/delete/compact
    history, the returned pairs equal the one-shot minhash_lsh_pairs
    over the LIVE corpus restricted to pairs touching a doc changed in
    that span. Derandomized; drives the real merge path."""
    from pyspark.sql import types as T

    from datax_spark.icetable.table import IceTable
    from datax_spark.operators.merge import apply_epoch

    base = tmp_path_factory.mktemp("mh_prop")
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    t = IceTable.create(spark, base / "t", schema, num_partitions=2,
                        key_column="url")
    idx, _ = MinHashIndex.create_from_table(
        spark, t, base / "idx", k=8, bands=4, jaccard_threshold=0.5
    )
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
                (k, _KEYS.index(k), _TEXTS[v],
                 "U" if k in model else "I", lsn)
                for k, v in sorted(op.items())
            ]
            changed = set(op)
            model.update(op)
        else:
            present = sorted(k for k in op if k in model)
            if not present:
                continue
            lsn += 1
            rows = [(k, _KEYS.index(k), None, "D", lsn) for k in present]
            changed = set(present)
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
        got = _pairs(idx.sync(t))
        live = spark.createDataFrame(
            [(_KEYS.index(k), _TEXTS[v]) for k, v in sorted(model.items())]
            or [(None, None)],
            "doc_id long, text string",
        ).filter("doc_id IS NOT NULL")
        changed_ids = {_KEYS.index(k) for k in changed}
        want = {
            p: j
            for p, j in _pairs(
                minhash_lsh_pairs(live, k=8, bands=4, jaccard_threshold=0.5)
            ).items()
            if p[0] in changed_ids or p[1] in changed_ids
        }
        assert got == want, (ops, model, changed, got, want)
