"""Declarative data-quality expectations — the pre-load contract check.

DataX-style jobs bolt quality onto the reader (dirty routing +
errorLimit, operators/quarantine.py); warehouses also want the
complement: TABLE-level expectations evaluated before a load is
accepted ("url never null", "key unique", "lang in the allowed set",
"score within range"). This module compiles a list of declarative
constraints into ONE fused aggregate pass — every metric is a codegen
conditional aggregate over the same scan, so checking 20 constraints
costs the same single pass as checking one. Uniqueness is the one
exception that genuinely needs its own shuffle (count distinct over
the key); it rides the same job as a second aggregate, not a second
scan of its own per constraint.

Output: one row per constraint — (constraint, column, metric, threshold,
passed) — small enough to drive a commit/abort decision or land in a
quality ledger.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Expect:
    """One constraint: ``kind`` ∈ {not_null, unique, in_set, in_range,
    matches, min_rows}. ``metric`` is always a satisfaction ratio in
    [0, 1] (min_rows: rows/expected capped at 1) compared against
    ``threshold`` (default 1.0 = every row)."""

    kind: str
    column: str = ""
    threshold: float = 1.0
    values: tuple = field(default=())
    lo: float | None = None
    hi: float | None = None
    pattern: str = ""
    expected_rows: int = 0

    @property
    def name(self) -> str:
        return f"{self.kind}({self.column})" if self.column else self.kind


def not_null(column: str, threshold: float = 1.0) -> Expect:
    return Expect("not_null", column, threshold)


def unique(column: str, threshold: float = 1.0) -> Expect:
    return Expect("unique", column, threshold)


def in_set(column: str, values: Sequence, threshold: float = 1.0) -> Expect:
    return Expect("in_set", column, threshold, values=tuple(values))


def in_range(column: str, lo: float, hi: float, threshold: float = 1.0) -> Expect:
    return Expect("in_range", column, threshold, lo=lo, hi=hi)


def matches(column: str, pattern: str, threshold: float = 1.0) -> Expect:
    return Expect("matches", column, threshold, pattern=pattern)


def min_rows(expected_rows: int) -> Expect:
    return Expect("min_rows", "", 1.0, expected_rows=expected_rows)


def _ratio(cond: Column) -> Column:
    # avg of a 0/1 indicator == satisfaction ratio, one codegen agg
    return F.avg(F.when(cond, 1.0).otherwise(0.0))


def check(df: DataFrame, expectations: Sequence[Expect]) -> DataFrame:
    """Evaluate every expectation in one fused aggregate job; returns
    (constraint, column, metric, threshold, passed) per expectation,
    metric rounded to 6 dp."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for i, e in enumerate(expectations):
        c = F.col(e.column) if e.column else None
        if e.kind == "not_null":
            a = _ratio(c.isNotNull())
        elif e.kind == "unique":
            a = F.countDistinct(c).cast("double")
        elif e.kind == "in_set":
            a = _ratio(c.isin(list(e.values)))
        elif e.kind == "in_range":
            a = _ratio(c.isNotNull() & (c >= e.lo) & (c <= e.hi))
        elif e.kind == "matches":
            a = _ratio(c.isNotNull() & c.rlike(e.pattern))
        elif e.kind == "min_rows":
            a = F.count(F.lit(1)).cast("double")
        else:
            raise ValueError(f"unknown expectation kind {e.kind!r}")
        aggs.append(a.alias(f"__m{i}"))
    row = df.agg(*aggs)

    # explode the single stat row into one row per constraint —
    # driver-free: a literal-array posexplode over the same tiny row
    out = []
    for i, e in enumerate(expectations):
        m = F.col(f"__m{i}")
        if e.kind == "unique":
            m = m / F.greatest(F.col("__n").cast("double"), F.lit(1.0))
        elif e.kind == "min_rows":
            m = F.least(m / F.lit(float(max(e.expected_rows, 1))), F.lit(1.0))
        out.append(
            F.struct(
                F.lit(e.name).alias("constraint"),
                F.lit(e.column).alias("column"),
                F.round(m, 6).alias("metric"),
                F.lit(float(e.threshold)).alias("threshold"),
                (m >= e.threshold).alias("passed"),
            )
        )
    return row.select(F.explode(F.array(*out)).alias("r")).select("r.*")


def parse_constraints(constraints: Sequence[dict]) -> list[Expect]:
    """JSON/job-spec form → Expect list. Each entry:
    ``{"kind": "not_null"|"unique"|"in_set"|"in_range"|"matches"|
    "min_rows", "col": ..., and the kind's parameters}`` — the shared
    vocabulary of the ``expect`` transform and ``writer.wap``."""
    builders = {
        "not_null": lambda c: not_null(c["col"], float(c.get("threshold", 1.0))),
        "unique": lambda c: unique(c["col"], float(c.get("threshold", 1.0))),
        "in_set": lambda c: in_set(
            c["col"], c["values"], float(c.get("threshold", 1.0))
        ),
        "in_range": lambda c: in_range(
            c["col"], c["lo"], c["hi"], float(c.get("threshold", 1.0))
        ),
        "matches": lambda c: matches(
            c["col"], c["pattern"], float(c.get("threshold", 1.0))
        ),
        "min_rows": lambda c: min_rows(int(c["rows"])),
    }
    out = []
    for c in constraints:
        kind = c.get("kind")
        if kind not in builders:
            raise ValueError(
                f"unknown expectation kind {kind!r} — one of {sorted(builders)}"
            )
        out.append(builders[kind](c))
    return out


def enforce(df: DataFrame, expectations: Sequence[Expect]) -> None:
    """Raise ``ValueError`` naming every failed constraint — the abort
    gate in front of a table commit. Collects |expectations| rows."""
    failed = [
        f"{r['constraint']}: metric {r['metric']} < {r['threshold']}"
        for r in check(df, expectations).collect()
        if not r["passed"]
    ]
    if failed:
        raise ValueError("expectations failed: " + "; ".join(failed))
