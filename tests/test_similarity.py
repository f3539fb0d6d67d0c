"""Similarity-search operator tests (operators/similarity.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datax_spark.operators.similarity import (
    bruteforce_topk,
    cell_centroids,
    ivf_topk,
)


@pytest.fixture(scope="module")
def emb(spark):
    # two well-separated cells: label 0 near e1-axis, label 1 near e2-axis
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0], 0),
        (2, [0.8, 0.2, 0.0], 0),
        (3, [0.0, 1.0, 0.0], 1),
        (4, [0.1, 0.9, 0.0], 1),
        (5, [0.0, 0.8, 0.2], 1),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_bruteforce_ranking(emb):
    out = bruteforce_topk(emb, emb.filter(F.col("vec_id") == 0), k=3)
    rows = {r["rank"]: r for r in out.collect()}
    assert len(rows) == 3
    # nearest to [1,0,0] is vec 1, then 2; axis-orthogonal vectors last
    assert rows[1]["neighbor_id"] == 1
    assert rows[2]["neighbor_id"] == 2
    assert rows[1]["cos_sim"] > rows[2]["cos_sim"] > rows[3]["cos_sim"]


def test_bruteforce_excludes_self(emb):
    out = bruteforce_topk(emb, emb, k=5)
    assert out.filter(F.col("query_id") == F.col("neighbor_id")).count() == 0


def test_centroids_shape(emb):
    cents = {r["label"]: r["centroid"] for r in cell_centroids(emb).collect()}
    assert set(cents) == {0, 1}
    assert len(cents[0]) == 3
    # centroid of cell 0 points along e1
    assert cents[0][0] == pytest.approx(0.9, abs=1e-6)


def test_ivf_probes_right_cell(emb):
    out = ivf_topk(emb, emb.filter(F.col("vec_id").isin(0, 3)), k=2)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert {r["probe_cell"] for r in by_q[0]} == {0}
    assert {r["probe_cell"] for r in by_q[3]} == {1}
    # within-cell neighbors only
    assert {r["neighbor_id"] for r in by_q[0]} <= {1, 2}
    assert {r["neighbor_id"] for r in by_q[3]} <= {4, 5}


def test_ivf_matches_bruteforce_within_cell(emb):
    """With one probe cell, IVF == brute force restricted to the cell."""
    q = emb.filter(F.col("vec_id") == 1)
    ivf = {(r["neighbor_id"], r["rank"]) for r in ivf_topk(emb, q, k=2).collect()}
    bf = {
        (r["neighbor_id"], r["rank"])
        for r in bruteforce_topk(emb.filter(F.col("label") == 0), q, k=2).collect()
    }
    assert ivf == bf


def test_ivf_nprobe_widens_search(emb):
    """n_probe=2 on a 2-cell corpus == brute force over everything."""
    q = emb.filter(F.col("vec_id") == 0)
    ivf2 = {
        (r["neighbor_id"], r["rank"])
        for r in ivf_topk(emb, q, k=3, n_probe=2).collect()
    }
    bf = {
        (r["neighbor_id"], r["rank"])
        for r in bruteforce_topk(emb, q, k=3).collect()
    }
    assert ivf2 == bf


def test_trained_ivf_recall_vs_bruteforce(spark, sf_dir):
    """The k-means-trained IVF index (computed cells, not the provided
    label) reaches recall@5 >= 0.9 against the exact baseline while
    scanning ~6/16 of the corpus per query. Fully deterministic
    (fixed data, deterministic init + tie-breaks), so the bound is a
    constant, not a flake."""
    from pyspark.sql import functions as F

    from datax_spark.operators.similarity import bruteforce_topk, ivf_trained_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    truth = {
        (r["query_id"], r["neighbor_id"]) for r in bruteforce_topk(emb, q, k=5).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_trained_topk(
            emb, q, k=5, n_cells=16, n_iter=2, n_probe=6
        ).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, recall


def test_trained_kmeans_cells_deterministic(spark, sf_dir):
    from datax_spark.operators.similarity import train_kmeans_cells

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = {r["vec_id"]: r["cell"] for r in train_kmeans_cells(emb, 8, 2).collect()}
    b = {r["vec_id"]: r["cell"] for r in train_kmeans_cells(emb, 8, 2).collect()}
    assert a == b
    assert len(a) == emb.count()  # every vector assigned exactly once


def test_sampled_kmeans_training(spark, sf_dir):
    """train_fraction < 1 (the 10^9-vector path): the quantizer trains
    on a deterministic hash-gated ~half of the corpus, yet every vector
    gets exactly one cell, the assignment is replay-stable, and the
    trained IVF still clears the 0.9 recall bound — at n_probe=8/16
    instead of the full-train test's 6/16 (sampled centroids are
    noisier, so the same recall costs a wider probe; measured 0.83 at
    6/16 on this fixture)."""
    from datax_spark.operators.similarity import (
        bruteforce_topk,
        ivf_trained_topk,
        train_kmeans_cells,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = {
        r["vec_id"]: r["cell"]
        for r in train_kmeans_cells(emb, 8, 2, train_fraction=0.5).collect()
    }
    b = {
        r["vec_id"]: r["cell"]
        for r in train_kmeans_cells(emb, 8, 2, train_fraction=0.5).collect()
    }
    assert a == b  # hash gate, not RNG: bit-stable across runs
    assert len(a) == emb.count()  # full corpus tagged despite sampled training

    q = emb.filter(F.col("vec_id") < 20)
    truth = {
        (r["query_id"], r["neighbor_id"]) for r in bruteforce_topk(emb, q, k=5).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_trained_topk(
            emb, q, k=5, n_cells=16, n_iter=2, n_probe=8, train_fraction=0.5
        ).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, recall


def test_full_fraction_matches_legacy_path(spark, sf_dir):
    """train_fraction=1.0 takes the exact legacy code path (no final
    re-assignment pass) — the SQL-oracle contract output is unchanged."""
    from datax_spark.operators.similarity import train_kmeans_cells

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    legacy = {r["vec_id"]: r["cell"] for r in train_kmeans_cells(emb, 8, 2).collect()}
    full = {
        r["vec_id"]: r["cell"]
        for r in train_kmeans_cells(emb, 8, 2, train_fraction=1.0).collect()
    }
    assert legacy == full
