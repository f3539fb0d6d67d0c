"""Last-writer-wins resolution over LSN (SURVEY.md §2.5 W1 — normative).

Semantics (BASELINE.json:6): within a change batch, each key keeps the
event with the maximum LSN. Per-key LSN monotonicity is the source
contract, so max-LSN equals "last in log order"; a sequential fold over
the log and this set-wise resolution provably agree (property-tested in
tests/test_lww.py against ``reference_apply``).

Physical strategies — same semantics, different shuffle profiles:

* ``window`` — the rule's literal form: ``row_number() OVER (PARTITION BY
  key ORDER BY lsn DESC) = 1``. Full shuffle of all events on the key,
  sort per key. Skew-sensitive: one hot url lands on one reducer.
* ``max_by`` — ``groupBy(key).agg(max_by(struct(*), lsn))``. Catalyst
  plans a partial (map-side) aggregate before the shuffle, so duplicate
  keys collapse *before* crossing the wire — at 10^10 events with
  zipf-hot urls this is the difference between shuffling every event and
  shuffling ~one row per (mapper, hot key).
* ``salted_window`` — two-phase window for the skew-hostile case when a
  struct-agg is undesirable (e.g. very wide rows): resolve within
  (key, salt) first, then across salts.

Default ``max_by``: the rule fixes the *semantics* (Window-over-LSN);
the physical strategy is the engine's to choose, exactly as Catalyst
picks physical plans for declared semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datax_spark.functions.hashing import salted_key


def lww_resolve(
    df: DataFrame,
    key: str = "url",
    order: str = "lsn",
    strategy: str = "max_by",
    salt_factor: int = 16,
) -> DataFrame:
    """One row per ``key``: the event with the maximum ``order`` value."""
    cols = df.columns
    if strategy == "window":
        w = Window.partitionBy(key).orderBy(F.col(order).desc())
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    if strategy == "max_by":
        payload = F.struct(*[F.col(c) for c in cols])
        return (
            df.groupBy(key)
            .agg(F.max_by(payload, F.col(order)).alias("_row"))
            .select([F.col(f"_row.{c}").alias(c) for c in cols])
        )
    if strategy == "salted_window":
        pre = (
            df.withColumn("_sk", salted_key(key, order, salt_factor))
            .groupBy("_sk")
            .agg(F.max_by(F.struct(*[F.col(c) for c in cols]), F.col(order)).alias("_row"))
            .select([F.col(f"_row.{c}").alias(c) for c in cols])
        )
        w = Window.partitionBy(key).orderBy(F.col(order).desc())
        return (
            pre.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    raise ValueError(f"unknown lww strategy: {strategy}")
