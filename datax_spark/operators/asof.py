"""As-of (point-in-time) join — the CDC lookup Spark has no built-in for.

Joins every left row to the single most recent right row per key whose
timestamp is <= the left row's timestamp (``direction="backward"``, the
CDC case: "what was the dimension state when this event happened"), or
the earliest right row >= it (``"forward"``).

Spark-first shape — ONE shuffle, no range/cross join:
union the two sides tagged left/right, hash-partition by key, sort
within partition by (ts, side, tiebreak), and carry the right payload
forward with ``last(_r, ignorenulls=True)`` over an unbounded-preceding
window. Every left row then holds the nearest preceding right struct.
Cost at 100 TB: exactly one exchange on the join key + an in-partition
sort — the same price as the groupBy an aggregate would pay, with no
per-key fan-out (contrast a naive ``left.ts >= right.ts`` theta-join,
which explodes to |L|x|R| per key before taking max).

Determinism: right rows sharing (key, ts) are resolved by ``tiebreak``
(largest wins); equality ``left.ts == right.ts`` matches (backward
inclusive), because the right row sorts before the left row at equal
ts. An external ASOF JOIN oracle (e.g. DuckDB) must pre-dedupe its
right side the same way — its tie choice is otherwise arbitrary.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance: float | None = None,
    tiebreak: str | None = None,
    rsuffix: str = "_asof",
) -> DataFrame:
    """All left rows, plus the matched right payload columns (null when
    no right row qualifies).

    Right payload column ``c`` surfaces as ``c`` — or ``c + rsuffix``
    when the name collides with a left column; the matched right
    timestamp always surfaces as ``right_ts + rsuffix``. ``tolerance``
    (seconds for timestamps, plain difference for numerics) nulls out
    matches farther than the bound."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    rcols = [c for c in right.columns if c not in on and c != right_ts]
    payload = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c) for c in rcols]
    )

    # keep the tiebreak's NATIVE type (a string LSN must not be cast to
    # double — ANSI would throw, non-ANSI would null it out and break
    # the documented max-wins determinism); left rows get a typed null,
    # which is harmless because __is_left already orders them after
    # every right row at equal ts
    tb = F.col(tiebreak) if tiebreak else F.lit(0)
    r2 = right.select(
        *on,
        F.col(right_ts).alias("__ets"),
        F.lit(0).alias("__is_left"),
        tb.alias("__tb"),
        payload.alias("__r"),
    )
    tb_type = dict(r2.dtypes)["__tb"]
    l2 = left.select(
        "*",
        F.col(left_ts).alias("__ets"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(tb_type).alias("__tb"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)

    if direction == "backward":
        order = [F.col("__ets").asc(), F.col("__is_left").asc(), F.col("__tb").asc()]
    else:
        order = [F.col("__ets").desc(), F.col("__is_left").asc(), F.col("__tb").asc()]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w))

    if tolerance is not None:
        gap: Column = F.abs(
            F.col(left_ts).cast("double") - F.col("__m.__ts").cast("double")
        )
        u = u.withColumn(
            "__m", F.when(gap <= F.lit(float(tolerance)), F.col("__m"))
        )

    out = u.where(F.col("__is_left") == 1)
    sel = [F.col(c) for c in left.columns]
    sel.append(F.col("__m.__ts").alias(right_ts + rsuffix))
    for c in rcols:
        name = c + rsuffix if c in left.columns else c
        sel.append(F.col(f"__m.{c}").alias(name))
    return out.select(*sel)
