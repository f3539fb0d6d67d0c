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

from pyspark.sql import Column, DataFrame
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


def merge_into(
    table: IceTable,
    source: DataFrame,
    *,
    when_matched_update: dict[str, Column | str] | str | None = None,
    when_matched_update_condition: str | Column | None = None,
    when_matched_delete: bool = False,
    when_matched_delete_condition: str | Column | None = None,
    when_not_matched_insert: dict[str, Column | str] | str | None = "*",
    when_not_matched_insert_condition: str | Column | None = None,
    epoch: int | None = None,
    validate_unique_keys: bool = True,
    **apply_kwargs,
) -> EpochStats:
    """SQL ``MERGE INTO target USING source ON target.key = source.key``
    with WHEN MATCHED THEN UPDATE/DELETE and WHEN NOT MATCHED THEN
    INSERT clauses (Iceberg/Delta's flagship row-level op), expressed —
    like every op in this module — as self-generated change events
    through the exactly-once ``apply_epoch`` MERGE.

    The join condition is fixed to equality on the table's key column
    (the shape every keyed lake table and the CDC feed share); clause
    conditions and SET/INSERT expressions are SQL strings (or Columns)
    that may reference ``source.<col>`` and, for matched clauses,
    ``target.<col>`` — e.g. ``"source.warc_ts > target.warc_ts"``.

    Clause semantics, mirroring the standard:
    - ``when_matched_delete`` is evaluated before update: a matched row
      whose delete condition holds becomes a D event; otherwise, if the
      update condition holds, a U event (SET columns take their
      expressions, every other payload column keeps the TARGET value —
      a subset SET never nulls untouched columns); otherwise no action.
    - ``when_not_matched_insert`` maps columns to expressions over
      ``source.*``, or ``"*"`` for "every source payload column by
      name" (unmentioned table columns become typed nulls).
    - ``"*"`` for ``when_matched_update`` likewise means "SET every
      source payload column".
    - SET/INSERT may assign columns the table doesn't have yet — the
      additive schema-evolution path, same as ``update_where``.
    - Two source rows with one key is the standard's cardinality
      violation and raises (``validate_unique_keys=False`` skips the
      check job when the source is unique by construction, e.g. the
      output of an LWW resolve).

    Scale shape: the clause evaluation joins the source against a
    bloom-pruned, partition-pruned slice of the target (only the
    source keys' partitions, only files whose bloom may contain a
    source key — a file pruned out provably holds none, so the left
    join against the slice equals one against the full state). The
    resulting event batch then rides the normal merge epoch: replay is
    a ledger no-op, later feed events win the LSN race, lineage and
    CoW/MoR apply unchanged.
    """
    key = table.key_column
    if key not in source.columns:
        raise ValueError(f"MERGE source lacks the table key column {key!r}")
    if (
        when_matched_update is None
        and not when_matched_delete
        and when_not_matched_insert is None
    ):
        raise ValueError("MERGE with no WHEN clause is a no-op; refuse it")
    if validate_unique_keys:
        row = source.agg(
            F.count(F.lit(1)).alias("n"), F.countDistinct(key).alias("d")
        ).first()
        if row["n"] != row["d"]:
            raise ValueError(
                f"MERGE cardinality violation: {row['n'] - row['d']} duplicate "
                f"source keys (the standard forbids two source rows matching "
                f"one target row); LWW-resolve the source first"
            )

    from datax_spark.functions.hashing import url_partition

    pids = {
        r["pid"]
        for r in source.select(
            url_partition(F.col(key), table.num_partitions).alias("pid")
        )
        .distinct()
        .collect()
    }
    state, _ = table.read_partitions(
        pids, with_lsn=True, keys_df=source.select(key)
    )
    lsn = _stamp(table)

    payload = [c for c in state.columns if c not in (key, "_lsn")]
    src_payload = [c for c in source.columns if c != key]

    def _exprs(spec) -> dict[str, Column]:
        if spec is None:
            return {}
        if spec == "*":
            return {c: F.col(f"source.{c}") for c in src_payload}
        out = {}
        for c, e in spec.items():
            if c == key:
                raise ValueError(f"MERGE cannot assign the key column {key!r}")
            out[c] = F.expr(e) if isinstance(e, str) else e
        return out

    upd = _exprs(when_matched_update)
    ins = _exprs(when_not_matched_insert)
    new_cols = [c for c in {**upd, **ins} if c not in state.columns]
    all_payload = payload + new_cols

    def _cond(c, default):
        if c is None:
            return default
        return F.expr(c) if isinstance(c, str) else c

    joined = source.alias("source").join(
        state.alias("target"),
        F.col(f"source.{key}") == F.col(f"target.{key}"),
        "left_outer",
    )
    matched = F.col(f"target.{key}").isNotNull()
    del_fire = (
        matched & _cond(when_matched_delete_condition, F.lit(True))
        if when_matched_delete
        else F.lit(False)
    )
    upd_fire = (
        matched & ~del_fire & _cond(when_matched_update_condition, F.lit(True))
        if upd
        else F.lit(False)
    )
    ins_fire = (
        (~matched) & _cond(when_not_matched_insert_condition, F.lit(True))
        if ins
        else F.lit(False)
    )

    def _typed_null(c):
        dt = state.schema[c].dataType if c in state.columns else None
        col = F.lit(None)
        return col.cast(dt) if dt is not None else col

    def _payload_col(c):
        # D rows carry typed nulls; U takes SET else target; I takes
        # INSERT else typed null
        upd_val = upd.get(c, F.col(f"target.{c}") if c in payload else _typed_null(c))
        ins_val = ins.get(c, _typed_null(c))
        return (
            F.when(del_fire, _typed_null(c))
            .when(upd_fire, upd_val)
            .otherwise(ins_val)
            .alias(c)
        )

    events = joined.filter(del_fire | upd_fire | ins_fire).select(
        F.lit(lsn).cast("long").alias("lsn"),
        F.when(del_fire, F.lit("D"))
        .when(upd_fire, F.lit("U"))
        .otherwise(F.lit("I"))
        .alias("op"),
        F.col(f"source.{key}").alias(key),
        *[_payload_col(c) for c in all_payload],
    )
    apply_kwargs.setdefault("extract", False)
    return apply_epoch(
        table, events, _auto_epoch(table) if epoch is None else epoch, **apply_kwargs
    )
