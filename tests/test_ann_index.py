"""Persisted IVF index (operators/ann_index.py): build/probe round trip
must be bit-equal to the unpersisted trained-IVF operator, and probing
must scan only the probed cells' partitions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datax_spark.operators.ann_index import IvfIndex
from datax_spark.operators.similarity import ivf_trained_topk

PARAMS = dict(n_cells=8, n_iter=2)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


@pytest.fixture(scope="module")
def index(spark, emb, tmp_path_factory):
    root = tmp_path_factory.mktemp("ivf") / "idx"
    return IvfIndex.build(emb, root, **PARAMS)


def _rows(df):
    return sorted(
        (r["query_id"], r["probe_cell"], r["neighbor_id"], r["cos_sim"], r["rank"])
        for r in df.collect()
    )


def test_probe_equals_unpersisted_operator(spark, emb, index):
    queries = emb.filter(F.col("vec_id") < 8)
    got = _rows(index.probe(queries, k=3, n_probe=2))
    want = _rows(
        ivf_trained_topk(emb, queries, k=3, n_probe=2, **PARAMS)
    )
    assert got == want and len(got) > 0


def test_meta_and_load_roundtrip(spark, index, emb):
    loaded = IvfIndex(spark, index.root)
    assert loaded.meta["n_cells"] == 8
    assert loaded.meta["rows"] == emb.count()
    assert loaded.centroids().count() <= 8


def test_probe_scans_only_probed_cells(spark, index, emb):
    queries = emb.filter(F.col("vec_id") < 2)
    out = index.probe(queries, k=3, n_probe=1)
    cells_in_result = {r["probe_cell"] for r in out.collect()}
    # with n_probe=1 each query reads exactly one cell
    assert len(cells_in_result) <= 2
    # the pruned corpus relation lists only the probed dirs
    plan = index.corpus(cells=sorted(cells_in_result))._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell" in plan or "cell#" in plan


def test_unloadable_without_meta(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        IvfIndex(spark, tmp_path / "nope")


def test_incremental_add_probes_find_new_vectors(spark, emb, tmp_path):
    root = tmp_path / "idx"
    base = emb.filter(F.col("vec_id") >= 10)
    idx = IvfIndex.build(base, root, **PARAMS)
    rows_before = idx.meta["rows"]
    new = emb.filter(F.col("vec_id") < 10)
    assert idx.add(new) == 10
    assert idx.meta["rows"] == rows_before + 10
    # an added vector's exact duplicate query must surface it at rank 1
    # (cos 1.0 with itself is excluded; probe with a copy under new id)
    q = new.filter(F.col("vec_id") == 3).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    top = idx.probe(q, k=1, n_probe=2).first()
    assert top["neighbor_id"] == 3 and top["cos_sim"] >= 0.9999
