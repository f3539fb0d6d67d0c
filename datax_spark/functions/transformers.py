"""Record transformers — DataX's five built-in Transformers + the type
conversion matrix, re-expressed as Column expressions (SURVEY.md §2.7
T1-T6; DataX background is public knowledge, the pinned reference
/root/reference/README.md:2 names only the platform scope).

Everything here is a JVM-side codegen expression; the `dx_groovy`
per-record escape hatch becomes a *vectorized* pandas UDF factory (the
engine bans row-at-a-time Python — BASELINE.json:15).

DataX semantics notes:
* transformers operate positionally on a record; here they take/return
  named columns — the schema-ful upgrade;
* ``dx_substr/dx_pad/dx_replace`` on a NULL column yield NULL (DataX
  raises or skips depending on version; NULL-propagation is the
  relational equivalent);
* the cast matrix is the 6x6 DataX Column lattice (LONG, DOUBLE,
  STRING, DATE, BOOL, BYTES); ``strict_cast`` returns both the cast
  value and an ok-flag so callers can route failures to quarantine
  (operators/quarantine.py) instead of silently nulling.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# DataX Column type lattice → Spark types (SURVEY.md §1.1)
DATAX_TYPES = {
    "long": "bigint",
    "double": "double",
    "string": "string",
    "date": "timestamp",
    "bool": "boolean",
    "bytes": "binary",
}


def dx_substr(col: Column | str, start: int, length: int) -> Column:
    """T1 — substring(col, start, length); 1-based like DataX/SQL."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, start, length)


def dx_pad(col: Column | str, side: str, total_len: int, pad: str) -> Column:
    """T2 — left/right pad to ``total_len`` with ``pad``."""
    c = F.col(col) if isinstance(col, str) else col
    if side == "l":
        return F.lpad(c, total_len, pad)
    if side == "r":
        return F.rpad(c, total_len, pad)
    raise ValueError(f"pad side must be 'l' or 'r', got {side!r}")


def dx_replace(col: Column | str, start: int, length: int, replacement: str) -> Column:
    """T3 — positional replace: overwrite ``length`` chars at 1-based
    ``start`` with ``replacement`` (DataX dx_replace semantics)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(
        F.substring(c, 1, start - 1),
        F.lit(replacement),
        c.substr(F.lit(start + length), F.length(c)),
    )


def dx_filter(df: DataFrame, predicate: str) -> DataFrame:
    """T4 — drop records matching ``predicate`` (SQL expression string,
    the DataX filter is drop-on-match)."""
    return df.filter(~F.expr(predicate))


def dx_vectorized(
    fn: Callable[[pd.Series], pd.Series], return_type: str = "string"
):
    """T5 — the dx_groovy escape hatch, vectorized: wrap a
    Series→Series function as an Arrow pandas UDF. Use built-in
    functions first; this exists for genuinely custom logic."""

    @pandas_udf(return_type)
    def _udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield fn(s)

    return _udf


def strict_cast(col: Column | str, to: str) -> tuple[Column, Column]:
    """T6 — DataX type-conversion matrix entry: returns
    (cast_value, ok_flag). ok is False where the source was non-null but
    the cast produced null (conversion failure) — callers route those
    rows to quarantine, mirroring DataX's dirty-record collector."""
    c = F.col(col) if isinstance(col, str) else col
    spark_t = DATAX_TYPES.get(to, to)
    # try_cast: under ANSI mode (Spark 4 default) a plain cast THROWS on
    # malformed input; DataX semantics are null-out + count as dirty
    casted = c.try_cast(spark_t)
    ok = c.isNull() | casted.isNotNull()
    return casted, ok
