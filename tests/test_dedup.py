"""Dedup operator-family tests (operators/dedup.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datax_spark.operators import dedup as DD


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = "the quick brown fox jumps over the lazy dog near the river bank tonight"
    return spark.createDataFrame(
        [
            (0, base),
            (1, base),  # exact dup of 0
            (2, "  THE quick   brown fox jumps over the lazy dog near the river bank today "),  # normalized dup of 0
            (3, near),  # near dup of 0
            (4, "completely different content about spark shuffles and parquet files here"),
        ],
        "doc_id long, text string",
    )


def test_exact_dedup(docs):
    groups = {r["keep_id"]: r["n_docs"] for r in DD.exact_dedup(docs).collect()}
    assert groups[0] == 2  # docs 0 and 1
    assert sum(groups.values()) == 5


def test_normalized_dedup(docs):
    groups = {r["keep_id"]: r["n_docs"] for r in DD.normalized_dedup(docs).collect()}
    assert groups[0] == 3  # 0, 1, 2 collapse after canonicalization


def test_minhash_lsh_finds_exact_and_near(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in DD.minhash_lsh_pairs(docs, jaccard_threshold=0.7).collect()
    }
    assert pairs[(0, 1)] == 1.0  # identical docs: all signatures agree
    assert (0, 3) in pairs or (1, 3) in pairs  # near dup caught by banding
    assert all(b != 4 and a != 4 for a, b in pairs)  # unrelated doc never pairs


def test_simhash_identical_docs_same_class(docs):
    classes = {r["keep_id"]: r["n_docs"] for r in DD.simhash_dedup(docs).collect()}
    assert classes.get(0, 0) >= 2  # 0 and 1 share a simhash


def test_ngram_jaccard_exact_values(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in DD.ngram_jaccard_pairs(docs, n=3, jaccard_threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0
    # docs 0 and 3 differ only in the last word: 11 shared of 12+12
    # distinct 3-shingles → J = 11 / 13
    assert pairs[(0, 3)] == pytest.approx(round(11 / 13, 4), abs=1e-4)


def test_embedding_near_dup_blocked(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [0.999, 0.001], 0),   # near-dup of 0, same block
            (2, [1.0, 0.0], 1),       # identical to 0 but different block → unseen
            (3, [0.0, 1.0], 0),       # orthogonal, same block
        ],
        "vec_id long, embedding array<float>, label int",
    )
    pairs = {(r["id_a"], r["id_b"]) for r in DD.embedding_near_dup_pairs(emb, threshold=0.99).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs  # blocking boundary (documented trade-off)
    assert (0, 3) not in pairs


def test_minhash_xxhash64_production_path(spark, sf_dir):
    """The xxhash64 signature variant (production hash — one JVM op per
    (token, seed)) must agree with the md5 contract form wherever the
    hash function cannot matter: documents with IDENTICAL token sets
    have identical signatures under ANY hash, so every identical-set
    pair must surface with est_jaccard = 1.0 under both hashes.
    (Collision-driven 1.0 estimates for merely-similar sets ARE
    hash-dependent — that is the estimator's variance, not a bug.)"""
    from pyspark.sql import functions as F

    from datax_spark.operators.dedup import minhash_lsh_pairs, tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fp = (
        tokens(docs)
        .groupBy("doc_id")
        .agg(F.concat_ws(" ", F.array_sort(F.collect_list("tok"))).alias("fp"))
    )
    x, y = fp.alias("x"), fp.alias("y")
    same_set = {
        (r["id_a"], r["id_b"])
        for r in x.join(
            y, (F.col("x.fp") == F.col("y.fp")) & (F.col("x.doc_id") < F.col("y.doc_id"))
        )
        .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"))
        .collect()
    }
    assert same_set  # the fixture does contain identical-token-set docs
    for fn in ("md5", "xxhash64"):
        got = {
            (r["id_a"], r["id_b"]): r["est_jaccard"]
            for r in minhash_lsh_pairs(
                docs, k=8, bands=4, jaccard_threshold=0.7, hash_fn=fn
            ).collect()
        }
        missing = [p for p in same_set if got.get(p) != 1.0]
        assert not missing, (fn, missing[:5])


def test_embedding_kmeans_blocking_finds_planted_dups(spark, sf_dir):
    """Trained-cell blocking: a scaled copy of a vector has identical
    centroid cosines (deterministic tie-break => same cell), so planted
    near-duplicates must surface without any all-pairs join."""
    from pyspark.sql import functions as F

    from datax_spark.operators.dedup import embedding_near_dup_pairs_kmeans

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    planted = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.0)).alias("embedding"),
    )
    pairs = embedding_near_dup_pairs_kmeans(
        emb.unionByName(planted), threshold=0.99, n_cells=8, n_iter=2
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    for i in range(5):
        assert (i, i + 100000) in found, found


def test_embedding_lsh_blocking_finds_planted_dups(spark, sf_dir):
    """Random-hyperplane LSH blocking: an exact copy has identical
    quantized plane scores, hence identical buckets in EVERY band — a
    planted duplicate can never be missed, with no all-pairs join and
    no training pass."""
    from pyspark.sql import functions as F

    from datax_spark.operators.dedup import (
        embedding_lsh_buckets,
        embedding_lsh_pairs,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    planted = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.0)).alias("embedding"),
    )
    both = emb.unionByName(planted)
    pairs = embedding_lsh_pairs(both, threshold=0.99).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    for i in range(5):
        assert (i, i + 100000) in found, found

    # a positively-scaled copy lands in the same buckets up to the
    # floor(1000x) quantizer; with an exact copy the bucket vector is
    # equal by construction — assert it directly
    buckets = {
        (r["vec_id"], r["band"]): r["bucket"]
        for r in embedding_lsh_buckets(both).collect()
    }
    for i in range(5):
        for band in range(4):
            assert buckets[(i, band)] == buckets[(i + 100000, band)]


def test_embedding_lsh_candidates_are_bucketed_not_all_pairs(spark, sf_dir):
    """The candidate join must stay sparse: orthogonal-ish vectors that
    share no band bucket never reach the verify join, so the pair count
    is far below C(n, 2)."""
    from datax_spark.operators.dedup import embedding_lsh_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    # 8 planes per band -> 256 buckets per band: the production-shape
    # sparsity (the 16/4 contract default trades sparsity for recall at
    # the 500-vector fixture scale)
    got = embedding_lsh_pairs(emb, threshold=-1.0, n_planes=32, n_bands=4).count()
    assert got < n * (n - 1) // 2 * 0.25, (got, n)


def test_embedding_lsh_star_cap_bounds_tight_clusters(spark, sf_dir):
    """A tight cluster of near-identical vectors co-buckets under ANY
    plane set (every member is on the same side of every hyperplane), so
    the within-bucket self-join is the one place LSH goes quadratic.
    With max_bucket, oversized buckets compare members only to the
    lowest-id representative: the pair count over a planted cluster of m
    exact copies drops from C(m,2) to m-1, and the keep-lowest-id drop
    set (every non-representative member) is unchanged."""
    from pyspark.sql import functions as F

    from datax_spark.operators.dedup import embedding_lsh_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    m = 30
    one = emb.filter(F.col("vec_id") == 0)
    cluster = one
    for i in range(1, m):
        cluster = cluster.unionByName(
            one.select(
                (F.col("vec_id") + 200000 + i).alias("vec_id"), "embedding"
            )
        )
    both = emb.filter(F.col("vec_id") >= 100).unionByName(cluster)

    uncapped = embedding_lsh_pairs(both, threshold=0.99).collect()
    capped = embedding_lsh_pairs(both, threshold=0.99, max_bucket=8).collect()

    cluster_ids = {0} | {200000 + i for i in range(1, m)}
    unc_cluster = [
        r for r in uncapped if r["id_a"] in cluster_ids and r["id_b"] in cluster_ids
    ]
    cap_cluster = [
        r for r in capped if r["id_a"] in cluster_ids and r["id_b"] in cluster_ids
    ]
    assert len(unc_cluster) == m * (m - 1) // 2
    # star form: every member pairs with the representative only
    assert len(cap_cluster) == m - 1
    assert all(r["id_a"] == 0 for r in cap_cluster)
    # the keep-lowest-id drop set over the cluster is identical
    drops = lambda rows: {  # noqa: E731
        r["id_b"] for r in rows if r["id_a"] in cluster_ids
    }
    assert drops(cap_cluster) == drops(unc_cluster)


def test_simhash64_determinism_and_locality(spark):
    """64-bit SimHash: identical docs share a signature exactly; a
    one-word edit moves few bits (locality); an unrelated doc moves
    many. Cross-run determinism comes free (xxhash64 is seeded)."""
    from pyspark.sql import functions as F

    from datax_spark.operators.dedup import simhash64, tokens

    base = (
        "the quick brown fox jumps over the lazy dog near the river "
        "bank under a warm summer sun while birds sing in the trees"
    )
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base),  # identical
            (2, base.replace("fox", "cat")),  # near-dup
            (3, "completely different words about spark shuffles and "
                "parquet row groups and manifest files and commits"),
        ],
        "doc_id long, text string",
    )
    sig = {r["doc_id"]: r["simhash64"] for r in simhash64(tokens(docs)).collect()}
    assert sig[0] == sig[1]
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    assert 0 < ham(sig[0], sig[2]) <= 16
    assert ham(sig[0], sig[3]) > ham(sig[0], sig[2])

    # re-run in a fresh plan: bit-identical signatures
    sig2 = {r["doc_id"]: r["simhash64"] for r in simhash64(tokens(docs)).collect()}
    assert sig == sig2


def test_connected_components_transitive_closure(spark):
    """a-b and b-c pairs: the pairwise rule keeps {a, c}; components
    collapse the chain into ONE cluster rooted at the min id."""
    from pyspark.sql import functions as F  # noqa: F401

    pairs = spark.createDataFrame(
        [(0, 5), (5, 9), (20, 21), (9, 30)],
        "id_a long, id_b long",
    )
    got = {r["doc_id"]: r["cluster_id"] for r in
           DD.connected_components(pairs).collect()}
    assert got == {0: 0, 5: 0, 9: 0, 30: 0, 20: 20, 21: 20}


def test_connected_components_long_chain(spark):
    """Regression for the fixed 4-round min-label bound: a 12-hop
    near-dup chain (11..0 walked high-to-low so labels must travel the
    full diameter) must collapse into ONE cluster rooted at 0. The old
    n_iter=4 propagation provably split this into ≥2 clusters."""
    chain = [(i + 1, i) for i in range(11)]  # 1-0, 2-1, …, 11-10
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in
           DD.connected_components(pairs).collect()}
    assert got == {i: 0 for i in range(12)}


def test_cluster_split_long_chain_no_leakage(spark):
    """The leakage guarantee on a >4-hop chain: every member of a
    12-node near-dup chain must land in the SAME split (the old round
    bound could place chain ends in train and test)."""
    from datax_spark.operators.splits import cluster_split

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(15)], "doc_id long, text string"
    )
    chain = [(i + 1, i) for i in range(11)]
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    rows = cluster_split(docs, pairs).collect()
    by_id = {r["doc_id"]: r for r in rows}
    chain_splits = {by_id[i]["split"] for i in range(12)}
    chain_clusters = {by_id[i]["cluster_id"] for i in range(12)}
    assert chain_clusters == {0}
    assert len(chain_splits) == 1
    # singletons keep their own id as cluster
    assert by_id[14]["cluster_id"] == 14


def test_connected_components_on_minhash_pairs(docs):
    pairs = DD.minhash_lsh_pairs(docs, jaccard_threshold=0.7)
    got = {r["doc_id"]: r["cluster_id"] for r in
           DD.connected_components(pairs).collect()}
    # docs 0,1 exact dups (+3 near): one cluster rooted at 0; 4 absent
    assert got[0] == 0 and got[1] == 0
    assert 4 not in got


def test_simhash_hamming_pairs(docs):
    """Identical docs pair at 0; the near dup within the bit budget; the
    unrelated doc never pairs; guard on max_hamming."""
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             DD.simhash_hamming_pairs(docs, max_hamming=3).collect()}
    assert pairs[(0, 1)] == 0          # identical docs: distance zero
    assert (0, 2) in pairs             # normalized dup: tiny distance
    assert all(4 not in p for p in pairs)
    with pytest.raises(ValueError, match="max_hamming"):
        DD.simhash_hamming_pairs(docs, max_hamming=4)


def test_simhash_hamming_subsumes_exact_classes(docs):
    classes = DD.simhash_dedup(docs).collect()
    expect = sum(c["n_docs"] * (c["n_docs"] - 1) // 2 for c in classes)
    pairs = DD.simhash_hamming_pairs(docs, max_hamming=0).collect()
    # 0-distance pairs are exactly the within-class pairs
    assert expect > 0 and len(pairs) == expect
