"""Table profiling — per-column null / distinct / min / max report,
the data-quality snapshot an ingest pipeline runs before wiring a
source (DataX-style dirty-data analysis as one declarative job).

Scale shape: ONE aggregate pass over the table computes every
column's stats simultaneously (Catalyst plans the N count-distincts
as a single Expand + partial-agg tree — still one scan of the
parquet, map-side combined), then a driver-free explode unpivots the
single wide row into the (column -> stats) report. At 100 TB swap
``exact_distinct=False`` to approx_count_distinct (HLL++, one pass,
no Expand blow-up) — the report shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """One row per profiled column:
    (col_name, n_rows, n_nulls, n_distinct, min_num, max_num,
    min_str, max_str) — numeric min/max as double, string min/max in
    binary (UTF8) order; the other pair is NULL."""
    cols = columns or df.columns
    fields = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        col = F.col(c)
        aggs.append(
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__nulls")
        )
        aggs.append(
            (
                F.count_distinct(col)
                if exact_distinct
                else F.approx_count_distinct(col)
            ).alias(f"{c}__distinct")
        )
        if isinstance(fields[c], _NUMERIC):
            aggs.append(F.min(col).cast("double").alias(f"{c}__min_num"))
            aggs.append(F.max(col).cast("double").alias(f"{c}__max_num"))
        elif isinstance(fields[c], T.StringType):
            aggs.append(F.min(col).alias(f"{c}__min_str"))
            aggs.append(F.max(col).alias(f"{c}__max_str"))
    wide = df.agg(*aggs)

    def entry(c: str):
        num = isinstance(fields[c], _NUMERIC)
        s = isinstance(fields[c], T.StringType)
        return F.struct(
            F.lit(c).alias("col_name"),
            F.col("__rows").cast("long").alias("n_rows"),
            F.col(f"{c}__nulls").cast("long").alias("n_nulls"),
            F.col(f"{c}__distinct").cast("long").alias("n_distinct"),
            (F.col(f"{c}__min_num") if num else F.lit(None).cast("double")).alias("min_num"),
            (F.col(f"{c}__max_num") if num else F.lit(None).cast("double")).alias("max_num"),
            (F.col(f"{c}__min_str") if s else F.lit(None).cast("string")).alias("min_str"),
            (F.col(f"{c}__max_str") if s else F.lit(None).cast("string")).alias("max_str"),
        )

    return (
        wide.select(F.explode(F.array(*[entry(c) for c in cols])).alias("p"))
        .select("p.*")
    )
