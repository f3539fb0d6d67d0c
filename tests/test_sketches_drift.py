"""KMV distinct sketch + PSI drift — pure-python differentials and the
sketch's merge property (operators/sketches.py, operators/drift.py)."""

from __future__ import annotations

import hashlib
import math

from datax_spark.operators.drift import psi_by_category, psi_split
from datax_spark.operators.sketches import kmv_distinct, kmv_estimate, kmv_sketch

from pyspark.sql import functions as F

K = 256


def _py_kmv(values, k=K):
    hs = sorted({hashlib.md5(v.encode()).hexdigest() for v in values})[:k]
    if len(hs) < k:
        return float(len(hs)), hs
    frac = int(hs[-1][:13], 16) / float(1 << 52)
    return round((k - 1) / frac, 4), hs


def test_kmv_matches_pure_python_and_is_close(spark):
    vals = [f"value-{i % 5000}" for i in range(20000)]  # 5000 distinct
    df = spark.createDataFrame([(v,) for v in vals], "text string")
    row = kmv_distinct(df, "text", k=K).first()
    expect, _ = _py_kmv(set(vals))
    assert row["k"] == K and row["k_rows"] == K
    assert row["est_distinct"] == expect  # bit-identical, not just close
    assert abs(row["est_distinct"] - 5000) / 5000 < 0.25  # ~4 std errors


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame([(f"v{i % 40}",) for i in range(500)], "text string")
    row = kmv_distinct(df, "text", k=K).first()
    assert row["k_rows"] == 40 and row["est_distinct"] == 40.0


def test_kmv_merge_property(spark):
    a = spark.createDataFrame([(f"a-{i}",) for i in range(3000)], "text string")
    b = spark.createDataFrame([(f"b-{i}",) for i in range(3000)], "text string")
    direct = kmv_distinct(a.union(b), "text", k=K).first()
    merged_sketch = kmv_sketch(a, "text", K).union(kmv_sketch(b, "text", K))
    merged = kmv_estimate(
        merged_sketch.distinct().orderBy("h").limit(K), K
    ).first()
    assert direct.asDict() == merged.asDict()


def _py_psi(ref, cur, alpha=0.5):
    cats = sorted(set(ref) | set(cur))
    tr, tc, n = sum(ref.values()), sum(cur.values()), len(cats)
    out = {}
    for c in cats:
        p = (ref.get(c, 0) + alpha) / (tr + alpha * n)
        q = (cur.get(c, 0) + alpha) / (tc + alpha * n)
        out[c] = round((p - q) * math.log(p / q), 6)
    return out


def test_psi_matches_pure_python(spark):
    ref_counts = {"click": 500, "view": 300, "buy": 50, "refund": 7}
    cur_counts = {"click": 400, "view": 420, "buy": 90}  # refund vanished
    rows = [(c,) for c, n in ref_counts.items() for _ in range(n)]
    ref = spark.createDataFrame(rows, "event_type string")
    cur = spark.createDataFrame(
        [(c,) for c, n in cur_counts.items() for _ in range(n)], "event_type string"
    )
    got = {
        r["category"]: r["psi_term"]
        for r in psi_by_category(ref, cur, "event_type").collect()
    }
    assert got == _py_psi(ref_counts, cur_counts)
    # the one-sided category is present with a zero count, not dropped
    row = {
        r["category"]: r for r in psi_by_category(ref, cur, "event_type").collect()
    }["refund"]
    assert row["n_cur"] == 0 and row["psi_term"] > 0


def test_psi_zero_for_identical_split(spark):
    df = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3]) for i in range(600)], "id long, cat string"
    )
    # even/odd halves have identical composition → every term is 0
    out = psi_split(df, "cat", F.col("id") % 2 == 0).collect()
    assert all(r["psi_term"] == 0.0 for r in out)
