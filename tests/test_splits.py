"""Leakage-safe cluster splits: no near-dup pair straddles splits, the
cluster labels match a pure-python union-find, and the gate is
deterministic and covers every document exactly once.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from datax_spark.operators.splits import cluster_split, leakage_safe_split

# planted corpus: two duplicate chains, one 3-star, and singletons
DOCS = [
    (0, "alpha bravo charlie delta echo foxtrot golf hotel india"),
    (1, "alpha bravo charlie delta echo foxtrot golf hotel indiA"),  # ~dup of 0
    (2, "alpha bravo charlie delta echo foxtrot golf hoteL indiA"),  # ~dup of 1
    (10, "the market rallied on strong earnings reports this quarter"),
    (11, "the market rallied on strong earnings reports this quarteR"),  # ~dup
    (20, "completely unrelated text about gardening and soil quality"),
    (21, "another singleton document concerning medieval architecture"),
    (22, "a third loner text on deep sea bioluminescence patterns"),
]


def py_union_find(pairs: list[tuple[int, int]], nodes: set[int]) -> dict[int, int]:
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def py_gate(cluster: int, seed: str = "split") -> int:
    return int(hashlib.md5((seed + str(cluster)).encode()).hexdigest()[:8], 16) % 10000


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_no_pair_straddles_splits(spark):
    from datax_spark.operators.dedup import minhash_lsh_pairs

    docs = _df(spark)
    pairs = minhash_lsh_pairs(docs, k=8, bands=4, jaccard_threshold=0.5)
    out = cluster_split(docs, pairs)
    smap = {r["doc_id"]: r["split"] for r in out.collect()}
    prows = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    assert prows, "fixture must plant at least one near-dup pair"
    for a, b in prows:
        assert smap[a] == smap[b], (a, b)


def test_clusters_match_union_find_and_gate_matches_python(spark):
    from datax_spark.operators.dedup import minhash_lsh_pairs

    docs = _df(spark)
    pairs = minhash_lsh_pairs(docs, k=8, bands=4, jaccard_threshold=0.5)
    prows = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    exp_clusters = py_union_find(prows, {i for i, _ in DOCS})
    out = {r["doc_id"]: (r["cluster_id"], r["split"]) for r in
           cluster_split(docs, pairs).collect()}
    assert set(out) == {i for i, _ in DOCS}
    for doc, (cl, sp) in out.items():
        assert cl == exp_clusters[doc], doc
        g = py_gate(cl)
        exp_sp = "train" if g < 8000 else ("val" if g < 9000 else "test")
        assert sp == exp_sp, (doc, cl, g)


def test_every_doc_exactly_once_and_deterministic(spark):
    docs = _df(spark)
    a = sorted(tuple(r) for r in leakage_safe_split(docs, jaccard_threshold=0.5).collect())
    b = sorted(tuple(r) for r in leakage_safe_split(docs.repartition(7), jaccard_threshold=0.5).collect())
    assert a == b
    assert len(a) == len(DOCS)
    assert {r[2] for r in a} <= {"train", "val", "test"}


def test_bad_fractions_raise(spark):
    docs = _df(spark)
    try:
        cluster_split(docs, docs.select(F.col("doc_id").alias("id_a"),
                                        F.col("doc_id").alias("id_b")),
                      fractions=(0.5, 0.2, 0.2))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
