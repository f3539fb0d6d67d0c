"""Derived-artifact registry (operators/derived.py): registration in
table properties, sync_all maintenance, and purge_everywhere — partial
erasure is a compliance failure, so the purge must reach the table,
its history, and every registered artifact physically."""

from __future__ import annotations

from pyspark.sql import types as T

from datax_spark.icetable.table import IceTable
from datax_spark.operators import derived
from datax_spark.operators.dedup_index import MinHashIndex
from datax_spark.operators.merge import apply_epoch
from datax_spark.operators.text_index import Bm25Index

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def test_register_sync_all_purge_everywhere(spark, tmp_path):
    t = IceTable.create(
        spark, tmp_path / "t", SCHEMA, num_partitions=2, key_column="url"
    )
    t.bulk_overwrite(
        spark.createDataFrame(
            [
                ("u0", 0, "the quick brown fox jumps"),
                ("u1", 1, "the quick brown fox jumps"),
                ("u2", 2, "entirely different content here"),
            ],
            SCHEMA,
        ),
        epoch=0,
    )
    Bm25Index.build_from_table(t, tmp_path / "bm", n_buckets=8,
                               id_col="doc_id")
    MinHashIndex.create_from_table(
        spark, t, tmp_path / "mh", k=8, bands=4, jaccard_threshold=0.5
    )
    derived.register(t, "bm25", tmp_path / "bm")
    derived.register(t, "minhash", tmp_path / "mh")
    derived.register(t, "bm25", tmp_path / "bm")  # idempotent
    assert len(derived.registered(t)) == 2

    import pytest

    with pytest.raises(ValueError, match="unknown artifact kind"):
        derived.register(t, "bogus", tmp_path / "x")

    apply_epoch(
        t,
        spark.createDataFrame(
            [("u3", 3, "a quick brown document", "I", 9)],
            "url string, doc_id long, text string, op string, lsn long",
        ),
        epoch=1,
        extract=False,
    )
    out = derived.sync_all(spark, t)
    assert len(out) == 2
    assert Bm25Index(spark, tmp_path / "bm").meta["n_docs"] == 4

    res = derived.purge_everywhere(spark, t, ["u0"])
    assert res["table"]["rows_purged"] == 1
    assert {r["url"] for r in t.read().collect()} == {"u1", "u2", "u3"}
    bm = Bm25Index(spark, tmp_path / "bm")
    assert bm.postings(None).filter("doc_id = 0").count() == 0
    assert bm.meta["n_docs"] == 3
    mh = MinHashIndex.load(spark, tmp_path / "mh")
    m = mh._read_committed("members")
    assert m is None or m.filter("doc_id = 0").count() == 0
