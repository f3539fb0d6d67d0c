"""Interval (range) join — points against intervals without a theta
join.

Spark plans a raw ``p.ts >= i.start AND p.ts < i.end`` join as a
broadcast-nested-loop / cartesian: O(|P|·|I|) comparisons, the classic
scale killer for attribution windows, session containment, validity
lookups. This operator buckets time instead: every interval explodes to
the fixed-width buckets it covers, every point lands in exactly one
bucket, and the match becomes a hash EQUI-join on the bucket followed
by a codegen containment filter. Cost: one shuffle of |P| + |I|·(avg
interval width / bucket width) rows — linear, skew-safe, and each
(point, interval) pair is produced at most once (a point has ONE
bucket), so no post-join dedup is needed.

Pick ``bucket`` near the typical interval width: too small explodes the
interval side, too large makes buckets crowded. Both failure modes
degrade gracefully (it's still an equi-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _secs(c):
    # NTZ timestamps refuse a direct numeric cast under ANSI; go via
    # timestamp (session tz pinned UTC by the engine's conventions)
    return c.cast("timestamp").cast("double")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket: float = 3600.0,
    inclusive_end: bool = False,
    keys: tuple = (),
) -> DataFrame:
    """All (point, interval) pairs with start <= ts < end (or <= end
    when ``inclusive_end``); inner-join semantics (unmatched rows of
    either side are absent). ``keys`` are extra equi-join columns
    shared by both sides (e.g. user_id for per-user attribution) —
    putting them IN the join key keeps cross-key pairs out of the
    shuffle instead of filtering them after. Other column-name
    collisions must be resolved by the caller beforehand."""
    w = float(bucket)
    p = points.withColumn("__b", F.floor(_secs(F.col(point_ts)) / w))
    i = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(_secs(F.col(start_col)) / w).cast("long"),
                F.floor(_secs(F.col(end_col)) / w).cast("long"),
            )
        ),
    )
    ts = _secs(F.col(point_ts))
    cond = (ts >= _secs(F.col(start_col))) & (
        ts <= _secs(F.col(end_col))
        if inclusive_end
        else ts < _secs(F.col(end_col))
    )
    return p.join(i, ["__b", *keys]).where(cond).drop("__b")
