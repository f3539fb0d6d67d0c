"""Product-quantization tests (operators/pq.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datax_spark.operators import pq as PQ
from datax_spark.operators.similarity import bruteforce_topk

DIM, M, K_CODES = 8, 2, 4


@pytest.fixture(scope="module")
def corpus(spark):
    """4 tight clusters of 10 vectors in 8 dims, deterministic."""
    rows = []
    for c in range(4):
        base = [1.0 if i // 2 == c else 0.05 for i in range(DIM)]
        for j in range(10):
            eps = 0.01 * ((c * 10 + j) % 7)
            rows.append((c * 10 + j, [x + eps * ((i % 3) - 1) for i, x in enumerate(base)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_subvectors_shape(corpus):
    subs = PQ.subvectors(corpus, m=M, dim=DIM).collect()
    assert len(subs) == 40 * M
    r = next(x for x in subs if x["vec_id"] == 0 and x["sub"] == 1)
    assert len(r["sv"]) == DIM // M
    with pytest.raises(ValueError, match="not divisible"):
        PQ.subvectors(corpus, m=3, dim=DIM)


def test_train_deterministic_and_encode_range(corpus):
    cb1 = sorted(map(tuple, PQ.train_pq(corpus, M, K_CODES, 2, DIM).collect()))
    cb2 = sorted(map(tuple, PQ.train_pq(corpus, M, K_CODES, 2, DIM).collect()))
    assert [(s, c) for s, c, _ in cb1] == [(s, c) for s, c, _ in cb2]
    assert all(a[2] == b[2] for a, b in zip(cb1, cb2))  # identical centroids
    assert len(cb1) <= M * K_CODES

    cb = PQ.train_pq(corpus, M, K_CODES, 2, DIM)
    codes = {r["vec_id"]: r["codes"] for r in
             PQ.pq_encode(corpus, cb, M, DIM).collect()}
    assert len(codes) == 40
    assert all(len(c) == M and all(0 <= x < K_CODES for x in c) for c in codes.values())


def test_identical_vectors_share_codes(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0]), (1, [9.0, 9.0, -9.0, -9.0]),
         (2, [1.0, 2.0, 3.0, 4.0]), (3, [0.5, 0.5, 0.5, 0.5])],
        "vec_id long, embedding array<float>",
    )
    cb = PQ.train_pq(df, m=2, k_codes=2, n_iter=2, dim=4)
    codes = {r["vec_id"]: r["codes"] for r in PQ.pq_encode(df, cb, 2, 4).collect()}
    assert codes[0] == codes[2]
    assert codes[0] != codes[1]


def test_adc_neighbors_stay_in_cluster(corpus):
    """PQ collapses in-cluster distances (that's the point: 8 floats →
    2 codes), so exact-rank recall vs cosine bruteforce is not the
    contract — CLUSTER recall is: every ADC top-3 neighbor must come
    from the query's own cluster (vec_id // 10), and in-cluster ADC
    distance must be far below out-of-cluster."""
    queries = corpus.filter("vec_id % 10 = 0")
    approx = PQ.pq_topk(corpus, queries, k=3, m=M, k_codes=K_CODES, n_iter=2, dim=DIM)
    rows = approx.collect()
    assert len(rows) == 4 * 3
    assert all(r["neighbor_id"] // 10 == r["query_id"] // 10 for r in rows)
    # and the exact search agrees on the cluster structure
    exact = bruteforce_topk(corpus, queries, k=3)
    assert all(r["neighbor_id"] // 10 == r["query_id"] // 10 for r in exact.collect())


def test_adc_separation(corpus):
    """Rank-4+ (first out-of-cluster candidates excluded by k=3 here)
    check via a full scoring pass: in-cluster ADC ≪ out-of-cluster."""
    queries = corpus.filter("vec_id = 0")
    allk = PQ.pq_topk(corpus, queries, k=39, m=M, k_codes=K_CODES, n_iter=2, dim=DIM)
    rows = sorted(allk.collect(), key=lambda r: r["rank"])
    in_c = [r["approx_dist"] for r in rows if r["neighbor_id"] // 10 == 0]
    out_c = [r["approx_dist"] for r in rows if r["neighbor_id"] // 10 != 0]
    assert max(in_c) < min(out_c)


def test_ivfpq_index_matches_unpersisted(corpus, tmp_path, spark):
    """IVF-PQ: with every cell probed, the persisted index's ADC output
    is bit-equal to the unpersisted pq_topk (same trained codebook —
    both deterministic); with n_probe=1, neighbors stay in-cluster."""
    from datax_spark.operators.ann_index import IvfIndex

    idx = IvfIndex.build(
        corpus, tmp_path / "ivfpq", n_cells=4, n_iter=2,
        pq_m=M, pq_codes=K_CODES, pq_dim=DIM,
    )
    queries = corpus.filter("vec_id % 10 = 0")
    full = idx.probe_adc(queries, k=3, n_probe=4)
    ref = PQ.pq_topk(corpus, queries, k=3, m=M, k_codes=K_CODES, n_iter=2, dim=DIM)
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, ref.collect()))

    one = idx.probe_adc(queries, k=3, n_probe=1).collect()
    assert len(one) == 12
    assert all(r["neighbor_id"] // 10 == r["query_id"] // 10 for r in one)


def test_ivfpq_add_encodes_with_frozen_codebook(corpus, tmp_path, spark):
    from datax_spark.operators.ann_index import IvfIndex

    idx = IvfIndex.build(
        corpus, tmp_path / "ivfpq2", n_cells=4, n_iter=2,
        pq_m=M, pq_codes=K_CODES, pq_dim=DIM,
    )
    cb_before = sorted(map(tuple, idx.pq_codebook().collect()))
    # plant a duplicate of vec 0 under a new id
    dup = corpus.filter("vec_id = 0").select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    assert idx.add(dup) == 1
    assert sorted(map(tuple, idx.pq_codebook().collect())) == cb_before
    rows = {r["vec_id"]: (r["cell"], r["codes"]) for r in
            idx.corpus().filter("vec_id in (0, 1000)").collect()}
    assert rows[1000] == rows[0]  # same cell, identical frozen-codebook codes
    # and the probe scores it exactly like the original (ADC ties → ids)
    got = idx.probe_adc(corpus.filter("vec_id = 0"), k=40, n_probe=1).collect()
    by_id = {r["neighbor_id"]: r["approx_dist"] for r in got}
    assert by_id[1000] == min(by_id.values())


def test_pq_guard_on_plain_index(corpus, tmp_path, spark):
    import pytest as _pytest

    from datax_spark.operators.ann_index import IvfIndex

    idx = IvfIndex.build(corpus, tmp_path / "plain", n_cells=4, n_iter=1)
    with _pytest.raises(ValueError, match="without PQ"):
        idx.probe_adc(corpus.limit(1))


def test_probe_adc_rerank_exact_ordering(corpus, tmp_path, spark):
    """Two-stage serving: ADC shortlists, exact cosine orders the final
    top-k — every reranked neighbor comes from the ADC shortlist, and
    with a full shortlist the ordering matches bruteforce cosine."""
    from datax_spark.operators.ann_index import IvfIndex

    idx = IvfIndex.build(
        corpus, tmp_path / "rr", n_cells=4, n_iter=2,
        pq_m=M, pq_codes=K_CODES, pq_dim=DIM,
    )
    queries = corpus.filter("vec_id % 10 = 0")
    short = {(r["query_id"], r["neighbor_id"]) for r in
             idx.probe_adc(queries, k=9, n_probe=4).collect()}
    rr = idx.probe_adc(queries, k=3, n_probe=4, rerank=9).collect()
    assert {(r["query_id"], r["neighbor_id"]) for r in rr} <= short
    # exact ordering: agree with bruteforce restricted to the shortlist
    exact = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in
             bruteforce_topk(corpus, queries, k=39).collect()}
    for r in rr:
        assert r["cos_sim"] == exact[(r["query_id"], r["neighbor_id"])]
    with pytest.raises(ValueError, match="rerank"):
        idx.probe_adc(queries, k=5, rerank=3)
