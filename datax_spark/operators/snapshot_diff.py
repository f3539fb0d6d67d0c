"""Snapshot→events bridge: incremental crawl ingestion.

A recrawl arrives as a full (or partial) SNAPSHOT of pages — a WARC
segment set, a vendor dump — not as a change stream. Loading it with
``bulk_overwrite`` rewrites the whole table; applying it naively as
all-UPDATE events makes the MERGE touch every key. This operator
computes the MINIMAL change-event batch between the table's current
state and the snapshot:

    key only in snapshot          → I
    key in both, payload differs  → U      (null-safe column compare)
    key only in table             → D      (only when ``emit_deletes`` —
                                            partial crawls must not
                                            delete unvisited pages)

Unchanged keys emit NOTHING, so the downstream ``apply_epoch`` cost
scales with the churn, not the crawl size — at Common-Crawl scale the
month-over-month churn is a small fraction of the corpus. The shape is
one full-outer join keyed on the table key (both sides hash-shuffle
once); the result feeds the exactly-once MERGE sink unchanged.

LSN: every emitted event carries ``base_lsn`` (default: the table's
current max applied LSN + 1). One value for the whole batch satisfies
the per-key monotone-LSN contract — each key appears at most once per
snapshot, and the value is strictly above every key's applied LSN —
and makes replays of the same diff idempotent under the MERGE guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datax_spark.icetable.table import IceTable


def snapshot_to_events(
    table: IceTable,
    snapshot: DataFrame,
    base_lsn: int | None = None,
    emit_deletes: bool = False,
    order_col: str | None = None,
) -> DataFrame:
    """(lsn, op, key, *payload columns) — the minimal event batch that
    moves ``table`` to the snapshot's state (∪ untouched keys unless
    ``emit_deletes``). Payload columns are the snapshot's non-key
    columns; D rows carry null payloads (the MERGE delete leg only
    needs the key). Snapshot-only columns (schema evolution) count as
    changed whenever non-null — the table must converge to them.

    Duplicate snapshot keys (the same URL in two crawl segments is
    routine): when ``order_col`` is given (e.g. ``warc_ts``) the
    LATEST row per key wins deterministically — ties on ``order_col``
    (same URL, same warc_ts in two segments) break on a hash of the
    payload columns, so the winner never depends on partition order;
    rows tied on that too are bit-identical and the pick is moot.
    Without ``order_col`` the key set is VALIDATED unique and
    duplicates raise — silently fanning out one key into several
    same-LSN events would make the merged row nondeterministic."""
    key = table.key_column
    if key not in snapshot.columns:
        raise ValueError(f"snapshot lacks the table key column {key!r}")
    if order_col is not None:
        from pyspark.sql import Window

        tie = F.xxhash64(*[F.col(c) for c in snapshot.columns])
        w = Window.partitionBy(key).orderBy(F.col(order_col).desc(), tie.desc())
        snapshot = (
            snapshot.withColumn("_sd_rn", F.row_number().over(w))
            .filter(F.col("_sd_rn") == 1)
            .drop("_sd_rn")
        )
    else:
        row = snapshot.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col(key)).alias("d"),
        ).first()
        if row["n"] != row["d"]:
            raise ValueError(
                f"snapshot has {row['n'] - row['d']} duplicate {key!r} rows — "
                "pass order_col to resolve them deterministically"
            )
    state = table.read(with_lsn=True)
    if base_lsn is None:
        row = state.agg(F.max("_lsn").alias("m")).first()
        base_lsn = int(row["m"] or 0) + 1

    payload = [c for c in snapshot.columns if c != key]
    compare = [c for c in payload if c in state.columns]
    new_cols = [c for c in payload if c not in state.columns]
    a = state.select(
        F.col(key).alias(f"a_{key}"),
        *[F.col(c).alias(f"a_{c}") for c in compare],
    )
    b = snapshot.select(
        F.col(key).alias(f"b_{key}"),
        *[F.col(c).alias(f"b_{c}") for c in payload],
    )
    j = a.join(b, a[f"a_{key}"] == b[f"b_{key}"], "full_outer")

    changed = F.lit(False)
    for c in compare:
        changed = changed | ~F.col(f"a_{c}").eqNullSafe(F.col(f"b_{c}"))
    for c in new_cols:  # evolved column with a value: row must update
        changed = changed | F.col(f"b_{c}").isNotNull()
    op = (
        F.when(F.col(f"a_{key}").isNull(), "I")
        .when(F.col(f"b_{key}").isNull(), "D")
        .otherwise(F.when(changed, "U"))  # null op = unchanged, dropped
    )
    out = (
        j.withColumn("_op", op)
        .filter(F.col("_op").isNotNull())
        .filter((F.col("_op") != "D") | F.lit(emit_deletes))
        .select(
            F.lit(base_lsn).cast("long").alias("lsn"),
            F.col("_op").alias("op"),
            F.coalesce(f"b_{key}", f"a_{key}").alias(key),
            *[F.col(f"b_{c}").alias(c) for c in payload],
        )
    )
    return out
