"""explain_pair: the per-pair evidence must equal pure-python
recomputation AND agree with the corpus operators' own signals."""

from __future__ import annotations

import pytest

from datax_spark.operators.dedup_explain import explain_pair


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over a lazy dog"),
        (3, "completely different content entirely here now"),
        (4, "tiny"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_shingles(text, n=3):
    t = [x for x in text.split(" ") if x]
    return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}


def test_matches_pure_python_jaccard(spark):
    docs = _docs(spark)
    ev = explain_pair(docs, 1, 2)
    a, b = _py_shingles(docs.collect()[0]["text"]), _py_shingles(
        docs.collect()[1]["text"]
    )
    assert ev["shared_3grams"] == len(a & b)
    assert ev["union_3grams"] == len(a | b)
    assert ev["jaccard_3gram"] == round(len(a & b) / len(a | b), 4)
    # near-identical docs: strong evidence on every signal
    assert ev["minhash_band_collisions"] >= 1
    assert ev["simhash16_hamming"] <= 4

    far = explain_pair(docs, 1, 3)
    assert far["shared_3grams"] == 0 and far["jaccard_3gram"] == 0.0
    assert far["simhash16_hamming"] >= ev["simhash16_hamming"]


def test_identical_and_short_docs(spark):
    docs = _docs(spark)
    same = explain_pair(docs.union(docs.withColumn("doc_id", docs.doc_id + 10)), 1, 11)
    assert same["jaccard_3gram"] == 1.0
    assert same["minhash_band_collisions"] == same["minhash_bands"]
    assert same["simhash16_hamming"] == 0
    short = explain_pair(docs, 1, 4)  # doc 4 is shorter than one shingle
    assert short["union_3grams"] > 0 and short["shared_3grams"] == 0


def test_missing_id_raises(spark):
    with pytest.raises(ValueError, match="need exactly ids"):
        explain_pair(_docs(spark), 1, 99)


def test_agrees_with_corpus_operators(spark):
    """The evidence uses the SAME constructions as the corpus jobs:
    band collisions ≥ 1 ⟺ the pair surfaces in minhash_lsh_pairs."""
    from datax_spark.operators.dedup import minhash_lsh_pairs

    docs = _docs(spark)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            docs, k=8, bands=4, jaccard_threshold=0.0
        ).collect()
    }
    ev = explain_pair(docs, 1, 2)
    assert ((1, 2) in pairs) == (ev["minhash_band_collisions"] >= 1)
