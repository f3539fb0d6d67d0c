"""Dirty-record routing + error budget (SURVEY.md §2.2 P5, FIXTURES.md F4).

DataX routes records that fail conversion/write to a side collector with
a configurable error budget [PK]. Spark-first equivalent: a validity
predicate splits the batch into a main path and a quarantine path — two
filters over one scan, no UDF, fully codegen'd.

Dirty criteria (must mirror ``datagen.reference_apply`` exactly):
null/empty url, op outside {I,U,D}, null or non-positive lsn.
Per-key LSN *regressions with positive lsn* are not dirty — they are
late duplicates, resolved to no-ops by LWW + the MERGE lsn guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VALID_OPS = ("I", "U", "D")


class ErrorBudgetExceeded(RuntimeError):
    pass


def dirty_predicate(key: str = "url") -> F.Column:
    return (
        F.col(key).isNull()
        | (F.length(key) == 0)
        | ~F.col("op").isin(*VALID_OPS)
        | F.col("lsn").isNull()
        | (F.col("lsn") <= 0)
    )


def split_dirty(df: DataFrame, key: str = "url") -> tuple[DataFrame, DataFrame]:
    """Returns (clean, dirty). Both are lazy filters over the same scan;
    Catalyst pushes each predicate into the source."""
    pred = dirty_predicate(key)
    return df.filter(~pred), df.filter(pred)


def check_error_budget(rows_in: int, rows_dirty: int, max_ratio: float | None) -> None:
    if max_ratio is None or rows_in == 0:
        return
    if rows_dirty / rows_in > max_ratio:
        raise ErrorBudgetExceeded(
            f"dirty ratio {rows_dirty}/{rows_in} exceeds budget {max_ratio}"
        )
