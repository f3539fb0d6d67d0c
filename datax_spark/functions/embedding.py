"""Embedding-vector utility operators — all codegen array expressions
over an `array<float>` column (no UDF): L2 norm/normalize, symmetric
int8 quantization (the standard 4× storage/bandwidth cut before ANN
serving), and Achlioptas ±1 random projection (train-free dimensionality
reduction; Johnson-Lindenstrauss distance preservation).

Scale notes (10^9+ vectors): each op is a narrow per-row projection —
no shuffle, no state. The projection matrix is a FROZEN Python-side
constant (md5-derived signs baked into the plan as literals), so the
same seed projects identically everywhere — including inside the DuckDB
oracle, which is generated from the same sign function.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def l2_norm(v: Column) -> Column:
    return F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double"))
    )


def l2_normalize(v: Column) -> Column:
    """Unit-norm copy; the zero vector stays zero (no NULL/NaN leak)."""
    n = l2_norm(v)
    return F.when(n > 0, F.transform(v, lambda x: x.cast("double") / n)).otherwise(
        F.transform(v, lambda x: x.cast("double"))
    )


def quantize_scale(v: Column) -> Column:
    """Symmetric per-vector scale: max|x| / 127 (0.0 for the zero
    vector — quantized values are then all 0 and dequantize exactly)."""
    return (
        F.aggregate(v, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x.cast("double"))))
        / F.lit(127.0)
    )


def quantize_int8(v: Column, scale: Column) -> Column:
    """int8-range codes (stored as int array: parquet has no int8 and
    the oracle compares values, not widths)."""
    return F.when(
        scale > 0,
        F.transform(v, lambda x: F.round(x.cast("double") / scale).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))


def dequantize_int8(q: Column, scale: Column) -> Column:
    return F.transform(q, lambda x: x.cast("double") * scale)


def projection_signs(dim_in: int, dim_out: int, seed: int = 42) -> list[list[int]]:
    """The frozen ±1 projection matrix: sign(i→j) from the first hex
    nibble of md5('{seed}:{i}:{j}'). Pure Python, shared verbatim by the
    Spark plan and the SQL oracle."""
    return [
        [
            1
            if hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[0] in "89abcdef"
            else -1
            for i in range(dim_in)
        ]
        for j in range(dim_out)
    ]


def sign_project(v: Column, dim_in: int, dim_out: int, seed: int = 42) -> list[Column]:
    """Achlioptas random projection: out_j = Σ_i v_i·s_ij / √dim_out,
    one codegen sum per output dim (the matrix is literal — nothing to
    join or broadcast)."""
    signs = projection_signs(dim_in, dim_out, seed)
    inv = 1.0 / (dim_out ** 0.5)
    return [
        (
            sum(
                F.element_at(v, i + 1).cast("double") * F.lit(signs[j][i])
                for i in range(dim_in)
            )
            * F.lit(inv)
        ).alias(f"p{j}")
        for j in range(dim_out)
    ]
