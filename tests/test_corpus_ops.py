"""Tests for the round-3 corpus operators: in-document line dedup,
hashed linear quality classifier, bloom-membership incremental dedup,
URL blocklist filtering, and corpus mixing weights."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


# ---------------------------------------------------------------- intra-doc

def test_intra_doc_line_dedup_keeps_first_in_order(spark):
    from datax_spark.operators.dedup import intra_doc_line_dedup

    df = spark.createDataFrame(
        [
            (1, "nav bar\ncontent A\nnav bar\n   \ncontent B\ncontent A"),
            (2, "only once"),
            (3, "\n\n  \n"),  # all-blank doc: empty text, zero lines
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in intra_doc_line_dedup(df).collect()}
    assert got[1]["text"] == "nav bar\ncontent A\ncontent B"
    assert (got[1]["n_lines_kept"], got[1]["n_lines_dropped"]) == (3, 2)
    assert got[2]["text"] == "only once"
    assert got[3]["text"] == "" and got[3]["n_lines_kept"] == 0


def test_intra_doc_line_dedup_zero_exchanges(spark):
    from datax_spark.operators.dedup import intra_doc_line_dedup

    df = spark.createDataFrame([(1, "a\nb\na")], "doc_id long, text string")
    plan = intra_doc_line_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------- classifier

def test_classifier_deterministic_and_threshold(spark):
    from datax_spark.functions.classifier import classify_quality

    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fox"), (3, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in classify_quality(df).collect()}
    assert rows[1]["score"] == rows[2]["score"]  # deterministic
    assert rows[3]["score"] == 0.0  # empty doc scores exactly bias
    assert rows[1]["keep"] == (rows[1]["score"] > 0)


def test_classifier_broadcast_form_matches_closed_form(spark):
    from datax_spark.functions.classifier import (
        classify_quality,
        classify_quality_broadcast,
        derived_weights_table,
    )

    df = spark.createDataFrame(
        [(i, f"tok{i} common word list tok{i * 7}") for i in range(50)],
        "doc_id long, text string",
    )
    w = derived_weights_table(spark)
    a = {r["doc_id"]: r["score"] for r in classify_quality(df).collect()}
    b = {
        r["doc_id"]: r["score"]
        for r in classify_quality_broadcast(df, w).collect()
    }
    assert a == b


def test_classifier_closed_form_zero_exchanges(spark):
    from datax_spark.functions.classifier import classify_quality

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = classify_quality(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------- bloom

def test_bloom_membership_no_false_negatives(spark):
    from datax_spark.operators.bloom_dedup import bloom_dedup_flags

    corpus = spark.createDataFrame(
        [(i, f"document number {i}") for i in range(200)],
        "doc_id long, text string",
    )
    # batch: 50 true dups (texts 0..49) + 150 new texts
    batch = spark.createDataFrame(
        [(1000 + i, f"document number {i}") for i in range(50)]
        + [(2000 + i, f"fresh page {i}") for i in range(150)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in bloom_dedup_flags(corpus, batch).collect()}
    assert len(rows) == 200
    # bloom has NO false negatives: every true dup must be flagged
    for i in range(50):
        assert rows[1000 + i]["bloom_hit"] and rows[1000 + i]["exact_dup"]
    # bloom-negative rows are definitively new
    for r in rows.values():
        if not r["bloom_hit"]:
            assert not r["exact_dup"]
    # exact verify never claims a dup for genuinely new text
    for i in range(150):
        assert not rows[2000 + i]["exact_dup"]


def test_bloom_build_is_tiny_and_probe_broadcasts(spark):
    from datax_spark.operators.bloom_dedup import build_bloom, probe_bloom

    corpus = spark.createDataFrame(
        [(i, f"t{i}") for i in range(500)], "doc_id long, text string"
    )
    bloom = build_bloom(corpus, F.col("text"), n_blocks=64)
    assert bloom.count() <= 64
    batch = spark.createDataFrame([(1, "t3")], "doc_id long, text string")
    probed = probe_bloom(batch, bloom, F.col("text"), n_blocks=64)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert probed.collect()[0]["bloom_hit"]


# ---------------------------------------------------------------- url filter

def test_blocklist_filter_verdicts(spark):
    from datax_spark.operators.url_filter import blocklist_filter

    docs = spark.createDataFrame(
        [
            (1, "https://WWW.Spam.example/page?utm_source=x"),
            (2, "https://sub.deep.spam.example/ok"),  # parent-suffix block
            (3, "https://fine.example/casino/slots"),  # pattern block
            (4, "https://fine.example/article"),
            (5, "http://another.ok/path#frag"),
        ],
        "doc_id long, url string",
    )
    blk = spark.createDataFrame([("spam.example",)], "domain string")
    got = {
        r["doc_id"]: r
        for r in blocklist_filter(docs, blk, [r"/casino/"]).collect()
    }
    assert got[1]["verdict"] == "blocked_domain"
    assert got[2]["verdict"] == "blocked_domain"
    assert got[3]["verdict"] == "blocked_pattern"
    assert got[4]["verdict"] == "kept"
    assert got[5]["verdict"] == "kept"
    assert got[1]["canon_url"] == "https://spam.example/page"


def test_blocklist_filter_no_corpus_shuffle(spark):
    from datax_spark.operators.url_filter import blocklist_filter

    docs = spark.createDataFrame(
        [(1, "https://a.b/p")], "doc_id long, url string"
    )
    blk = spark.createDataFrame([("x.y",)], "domain string")
    plan = (
        blocklist_filter(docs, blk, assume_distinct=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # with a pre-deduped blocklist the plan carries ONLY broadcast
    # exchanges — neither the corpus nor the blocklist ever
    # hash-repartitions; all joins are broadcast probes
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------- mixing

def test_mixing_weights_uniform_target(spark):
    from datax_spark.operators.mixing import mixing_weights

    df = spark.createDataFrame(
        # src_a: 3 docs × 4 tokens; src_b: 1 doc × 4 tokens
        [(i, "w x y z", "src_a") for i in range(3)]
        + [(10, "w x y z", "src_b")],
        "doc_id long, text string, source string",
    )
    w = {r["source"]: r for r in mixing_weights(df).collect()}
    assert w["src_a"]["tokens"] == 12 and w["src_b"]["tokens"] == 4
    # uniform target: scarce source keeps all, abundant source drops to
    # match its ratio: (0.5/0.75) / (0.5/0.25) = 1/3
    assert w["src_b"]["sample_p"] == 1.0
    assert abs(w["src_a"]["sample_p"] - 1 / 3) < 1e-6


def test_mixing_apply_respects_targets(spark):
    from datax_spark.operators.mixing import apply_mix, mixing_weights

    df = spark.createDataFrame(
        [(i, "tok " * 5, "big") for i in range(3000)]
        + [(10000 + i, "tok " * 5, "small") for i in range(1000)],
        "doc_id long, text string, source string",
    )
    w = mixing_weights(df, targets={"big": 0.5, "small": 0.5})
    sampled = apply_mix(df, w)
    counts = {
        r["source"]: r["n"]
        for r in sampled.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts["small"] == 1000  # under-target source fully kept
    # big downsampled to ≈ 1000 (md5-gate is approximate at this n)
    assert 850 <= counts["big"] <= 1150
    # determinism
    again = {
        r["source"]: r["n"]
        for r in apply_mix(df, w).groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert again == counts


def test_mixing_zero_target_drops_source(spark):
    from datax_spark.operators.mixing import apply_mix, mixing_weights

    df = spark.createDataFrame(
        [(1, "a b", "keep"), (2, "a b", "drop")],
        "doc_id long, text string, source string",
    )
    w = mixing_weights(df, targets={"keep": 1.0})
    rows = apply_mix(df, w).collect()
    assert [r["source"] for r in rows] == ["keep"]


def test_full_prep_classifier_gate_composes(spark):
    """The model quality gate slots into full_prep as a pre-shuffle
    codegen filter: result == running full_prep on the pre-filtered
    corpus, and the gate adds no exchange before the first shuffle."""
    from datax_spark.functions.classifier import hashed_linear_score
    from datax_spark.operators.curation import full_prep

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog today " * 6
          + f"tok{i} " * 4, "src")
         for i in range(40)],
        "doc_id long, text string, source string",
    )
    gated = full_prep(docs, classifier_threshold=0.0, gopher=False)
    pre = docs.filter(hashed_linear_score(F.col("text")) > 0.0)
    want = full_prep(pre, gopher=False)
    assert sorted(r["doc_id"] for r in gated.collect()) == sorted(
        r["doc_id"] for r in want.collect()
    )


def test_blocklist_filter_port_and_userinfo_no_bypass(spark):
    """Explicit ports and userinfo must not defeat domain matching."""
    from datax_spark.operators.url_filter import blocklist_filter

    docs = spark.createDataFrame(
        [
            (1, "https://spam.example:443/x"),
            (2, "https://spam.example:8080/x"),
            (3, "https://user:pw@spam.example/x"),
            (4, "https://fine.example:8080/x"),
        ],
        "doc_id long, url string",
    )
    blk = spark.createDataFrame([("spam.example",)], "domain string")
    got = {r["doc_id"]: r["verdict"]
           for r in blocklist_filter(docs, blk).collect()}
    assert got == {1: "blocked_domain", 2: "blocked_domain",
                   3: "blocked_domain", 4: "kept"}


def test_classifier_broadcast_keeps_empty_docs(spark):
    """The broadcast form returns the same ROW SET as the closed form:
    empty/whitespace docs score exactly bias (0), not vanish."""
    from datax_spark.functions.classifier import (
        classify_quality_broadcast,
        derived_weights_table,
    )

    df = spark.createDataFrame(
        [(1, "real words here"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in classify_quality_broadcast(
        df, derived_weights_table(spark)).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2]["score"] == 0.0 and rows[3]["score"] == 0.0
