"""Near-dup EXPLAIN — the evidence behind a dedup decision.

When a pipeline drops a document as a near-duplicate, the first
operator question is "of WHAT, and on what evidence?". This op computes
the full signal set for ONE candidate pair — n-gram Jaccard with the
shared shingles counted, MinHash band collisions (the md5 k=8 path the
LSH board queries use), and 16-bit SimHash Hamming distance — so a
drop can be audited without re-running the corpus job.

Driver-light by design: two documents, a few hundred shingles — this
is a debugging tool, not a corpus operator; the corpus-scale forms live
in operators/dedup.py and the SAME constructions are reused here
(tokens / minhash_signatures / band_bucket_exprs / simhash16), so the
evidence shown is exactly what the corpus jobs computed
(cross-checked in tests/test_dedup_explain.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datax_spark.operators.dedup import (
    band_bucket_exprs,
    minhash_signatures,
    simhash16,
    tokens,
)


def explain_pair(
    docs: DataFrame,
    id_a,
    id_b,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 8,
    bands: int = 4,
) -> dict:
    """One dict of pairwise evidence for (id_a, id_b):
    ``jaccard_{n}gram``, ``shared_{n}grams``, ``union_{n}grams``,
    ``minhash_band_collisions`` (of ``bands``), ``simhash16_hamming``.
    Raises if either id is absent."""
    pair = docs.filter(F.col(id_col).isin([id_a, id_b]))
    found = {r[id_col] for r in pair.select(id_col).collect()}
    if found != {id_a, id_b}:
        raise ValueError(
            f"need exactly ids {id_a!r} and {id_b!r}; found {sorted(found)}"
        )

    # ordered word n-gram shingle sets (the ngram-Jaccard construction)
    toks = pair.select(
        id_col,
        F.filter(F.split(F.col(text_col), " "), lambda t: t != "").alias("toks"),
    )
    sh = toks.select(
        id_col,
        F.array_distinct(
            F.transform(
                # guard: sequence(1, x) DESCENDS for x < 1 — short docs
                # must yield no shingles, not [1, 0]-indexed garbage
                F.when(
                    F.size("toks") >= n,
                    F.sequence(F.lit(1), F.size("toks") - n + 1),
                ).otherwise(F.array().cast("array<int>")),
                lambda i: F.concat_ws(
                    " ", *[F.element_at("toks", i + j) for j in range(n)]
                ),
            )
        ).alias("sh"),
    )
    sets = {r[id_col]: {s for s in r["sh"] if s} for r in sh.collect()}
    a, b = sets[id_a], sets[id_b]
    inter, union = len(a & b), len(a | b)

    tok = tokens(pair, id_col=id_col, text_col=text_col)
    sig = minhash_signatures(tok, k=k, id_col=id_col)
    buckets = sig.select(
        id_col, F.array(*band_bucket_exprs(k, bands)).alias("bk")
    )
    bks = {r[id_col]: list(r["bk"]) for r in buckets.collect()}
    collisions = sum(x == y for x, y in zip(bks[id_a], bks[id_b]))

    sh16 = {
        r[id_col]: r["simhash"] for r in simhash16(tok, id_col=id_col).collect()
    }
    hamming = bin(int(sh16[id_a], 2) ^ int(sh16[id_b], 2)).count("1")

    return {
        f"jaccard_{n}gram": round(inter / union, 4) if union else None,
        f"shared_{n}grams": inter,
        f"union_{n}grams": union,
        "minhash_band_collisions": collisions,
        "minhash_bands": bands,
        "simhash16_hamming": hamming,
    }
