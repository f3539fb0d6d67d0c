"""Embedding utility-op tests (functions/embedding.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datax_spark.functions import embedding as E


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(
        [
            (0, [3.0, 4.0]),
            (1, [0.0, 0.0]),  # zero vector: every op must stay finite
            (2, [-1.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )


def test_norm_and_normalize(vecs):
    rows = {
        r["vec_id"]: r
        for r in vecs.select(
            "vec_id",
            F.round(E.l2_norm(F.col("embedding")), 6).alias("n"),
            E.l2_normalize(F.col("embedding")).alias("u"),
        ).collect()
    }
    assert rows[0]["n"] == 5.0 and rows[0]["u"] == [0.6, 0.8]
    assert rows[1]["n"] == 0.0 and rows[1]["u"] == [0.0, 0.0]


def test_quantize_roundtrip(vecs):
    v = F.col("embedding")
    scale = E.quantize_scale(v)
    q = E.quantize_int8(v, scale)
    err = F.zip_with(
        v, E.dequantize_int8(q, scale), lambda x, d: F.abs(x.cast("double") - d)
    )
    rows = {
        r["vec_id"]: r
        for r in vecs.select(
            "vec_id", scale.alias("s"), q.alias("q"),
            F.aggregate(err, F.lit(0.0), lambda a, x: F.greatest(a, x)).alias("max_err"),
        ).collect()
    }
    assert rows[0]["q"] == [95, 127]  # 3/(4/127) = 95.25 → 95
    assert rows[0]["max_err"] <= rows[0]["s"] / 2 + 1e-12
    assert rows[1]["s"] == 0.0 and rows[1]["q"] == [0, 0] and rows[1]["max_err"] == 0.0
    assert rows[2]["q"] == [-127, 127]


def test_projection_deterministic_and_linear(spark):
    df = spark.createDataFrame(
        [(0, [float(i) for i in range(8)]), (1, [2.0 * i for i in range(8)])],
        "vec_id long, embedding array<float>",
    )
    cols = E.sign_project(F.col("embedding"), dim_in=8, dim_out=4, seed=7)
    rows = {r["vec_id"]: [r[f"p{j}"] for j in range(4)] for r in
            df.select("vec_id", *cols).collect()}
    # linearity: project(2v) == 2·project(v)
    assert rows[1] == pytest.approx([2 * x for x in rows[0]], abs=1e-9)
    # frozen matrix: same seed reproduces exactly, different seed doesn't
    again = {r["vec_id"]: [r[f"p{j}"] for j in range(4)] for r in
             df.select("vec_id", *E.sign_project(F.col("embedding"), 8, 4, seed=7)).collect()}
    assert again == rows
    other = E.projection_signs(8, 4, seed=8)
    assert other != E.projection_signs(8, 4, seed=7)
