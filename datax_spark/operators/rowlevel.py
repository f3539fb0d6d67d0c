"""Predicate row-level operations — SQL's ``DELETE FROM … WHERE`` and
``UPDATE … SET … WHERE`` (Iceberg row-level ops; the GDPR-purge /
bulk-correction / new-column-backfill surface every lake table needs),
expressed as SELF-GENERATED CHANGE EVENTS through the same exactly-once
``apply_epoch`` MERGE the CDC driver uses.

Why events instead of a bespoke rewrite: the merge path already owns
every hard part — bloom-pruned affected-file discovery, the CoW/MoR
write-strategy choice, the (epoch, partition_id) idempotence ledger,
per-row LSN guards, lineage, additive schema evolution. A predicate op
is just one more epoch: matching rows become D (or U-with-new-values)
events at ``max(_lsn) + 1``, so replaying the op is a ledger no-op and
any LATER CDC event for the same key still wins the LSN race. A
full-table backfill of a brand-new column is ``update_where(t,
{"quality": <expr>}, "true")`` — the additive-evolution path adds the
column mid-stream exactly as it does for evolving CDC feeds.

Scale shape: one pruned scan to find matching rows (the predicate
pushes into the parquet scan), one narrow max(_lsn) aggregate, then
the standard merge epoch — cost is O(affected partitions), and MoR
keeps the write O(matched rows) for sparse predicates (the `auto`
strategy picks it exactly then).

Epochs: explicit ``epoch`` = idempotent retry handle (re-running the
same op after a crash is a ledger skip). Auto-picked epochs come from
a RESERVED namespace (``ROWOPS_EPOCH_BASE + current_version``) that
can never collide with the CDC driver's own numbering or the
dead-letter reprocess namespace — colliding would ledger-skip a real
batch, which is silent data loss.

Single-writer discipline: like compaction, run these through the
owning driver (or a fenced handle — ``IceTable.acquire_writer_lease``);
the LSN stamp is read from the table, so a concurrent ingest racing
the op is serialized by the commit CAS either way.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from datax_spark.icetable.table import IceTable
from datax_spark.operators.merge import EpochStats, apply_epoch

# distinct from the CDC driver's 0-based epochs AND the dead-letter
# namespace (1 << 40, merge.REPROCESS_EPOCH_BASE)
ROWOPS_EPOCH_BASE = 1 << 41


def _stamp(table: IceTable) -> int:
    row = table.read(with_lsn=True).agg(F.max("_lsn").alias("m")).first()
    return int(row["m"] or 0) + 1


def _auto_epoch(table: IceTable) -> int:
    # fresh per table state: every commit bumps the version, so two
    # successive auto ops never share an epoch; retries that need
    # idempotence pass an explicit epoch instead
    return ROWOPS_EPOCH_BASE + table.current_version()


def delete_where(
    table: IceTable,
    predicate: str | Column,
    epoch: int | None = None,
    **apply_kwargs,
) -> EpochStats:
    """Delete every row matching ``predicate``. Emits D events at
    ``max(_lsn) + 1`` through the exactly-once merge; a later CDC
    insert for the same key (higher LSN) recreates it, exactly like
    any delete in the feed."""
    state = table.read(with_lsn=True)
    key = table.key_column
    lsn = _stamp(table)
    payload = [c for c in state.columns if c not in (key, "_lsn")]
    events = state.filter(predicate).select(
        F.lit(lsn).cast("long").alias("lsn"),
        F.lit("D").alias("op"),
        F.col(key),
        # D rows carry no payload; typed nulls keep the batch schema
        *[F.lit(None).cast(state.schema[c].dataType).alias(c) for c in payload],
    )
    apply_kwargs.setdefault("extract", False)
    return apply_epoch(
        table, events, _auto_epoch(table) if epoch is None else epoch, **apply_kwargs
    )


def update_where(
    table: IceTable,
    set_exprs: dict[str, Column | str],
    predicate: str | Column = "true",
    epoch: int | None = None,
    **apply_kwargs,
) -> EpochStats:
    """Update matching rows: ``set_exprs`` maps column → expression
    (a Column or SQL string, evaluated against the current row).
    Assigning a column the table doesn't have yet is the additive
    schema-evolution backfill (`update_where(t, {"quality": expr},
    "true")` populates a brand-new column table-wide in one epoch).
    The key column cannot be assigned — a key change is a delete plus
    an insert, which only the owning feed can decide."""
    key = table.key_column
    if key in set_exprs:
        raise ValueError(
            f"cannot UPDATE the key column {key!r} — emit a D event for "
            "the old key and an I for the new one through the feed instead"
        )
    state = table.read(with_lsn=True)
    lsn = _stamp(table)
    sets = {
        c: (F.expr(e) if isinstance(e, str) else e) for c, e in set_exprs.items()
    }
    payload = [c for c in state.columns if c not in (key, "_lsn")]
    new_cols = [c for c in sets if c not in state.columns]
    events = state.filter(predicate).select(
        F.lit(lsn).cast("long").alias("lsn"),
        F.lit("U").alias("op"),
        F.col(key),
        *[(sets[c] if c in sets else F.col(c)).alias(c) for c in payload],
        *[sets[c].alias(c) for c in new_cols],
    )
    apply_kwargs.setdefault("extract", False)
    return apply_epoch(
        table, events, _auto_epoch(table) if epoch is None else epoch, **apply_kwargs
    )
