"""Column-level (partial-image) change-event folding — the versioned-
put semantics of DataX's wide-column sinks (HBase per-column versions,
OTS UpdateRow: `/root/reference/README.md:2` names both systems; the
snapshot has no code, so the semantics follow the public HBase/
Tablestore data models and Debezium's partial-image convention):

    I <full row>   — insert/replace: every column takes the event's
                     value, nulls included (a null RESETS the column)
    U <patch>      — update: null payload columns mean KEEP the
                     current value; non-null columns overwrite
    D              — delete the key (prior column versions discarded)

Fold result per key = what a wide-column store's read-latest returns
after applying the events in LSN order. The engine's row-level MERGE
(operators/merge.py) treats U as a full image; this operator is the
column-level twin for feeds that ship sparse patches.

Shape for 100 TB: ONE key-hash exchange — every aggregate (reset
boundary, liveness, per-column last-non-null) is a window over the
same ``partitionBy(key)``, so Catalyst plans a single shuffle + sort,
exactly the LWW-resolve footprint. Per-column folding is a struct-max
expression (lsn-ordered), not a per-column self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def patch_fold(
    events: DataFrame,
    key: str = "url",
    lsn_col: str = "lsn",
    op_col: str = "op",
    payload_cols: list[str] | None = None,
    state: DataFrame | None = None,
    state_lsn_col: str = "_lsn",
) -> DataFrame:
    """Fold I/U/D partial-image events into final per-key rows:
    (key, *payload, lsn) where ``lsn`` is the key's highest applied
    event LSN. ``state`` (optional) is the table's current state,
    treated as a full image (op=I) at its ``state_lsn_col`` — events
    with lower LSNs are superseded by it, per-key monotonicity as in
    the MERGE sink.

    Semantics, precisely: let b = the key's highest I/D event LSN
    (None if only patches arrived). The key is LIVE unless its last
    I/D is a D with no later patch (a patch after D re-creates the row
    from the patch alone — upsert-style, matching OTS UpdateRow on a
    missing row). Column c = the latest non-null c among the boundary
    I row and later U rows; null if none set it (an I with null c
    RESETS c; patches never resurrect pre-boundary values)."""
    if payload_cols is None:
        payload_cols = [
            c for c in events.columns if c not in (key, lsn_col, op_col)
        ]
    ev = events.select(op_col, key, lsn_col, *payload_cols)
    if state is not None:
        base = state.select(
            F.lit("I").alias(op_col),
            F.col(key),
            F.col(state_lsn_col).cast("long").alias(lsn_col),
            *[
                (
                    F.col(c) if c in state.columns else F.lit(None)
                ).alias(c)
                for c in payload_cols
            ],
        )
        ev = ev.unionByName(base)

    w = Window.partitionBy(key)
    is_id = F.col(op_col).isin("I", "D")
    b = F.max(F.when(is_id, F.col(lsn_col))).over(w)
    last_idop = F.max(
        F.when(is_id, F.struct(F.col(lsn_col).alias("l"), F.col(op_col).alias("o")))
    ).over(w)["o"]
    max_u = F.max(F.when(F.col(op_col) == "U", F.col(lsn_col))).over(w)
    max_lsn = F.max(F.col(lsn_col)).over(w)
    # a row contributes column values iff it isn't a D and isn't
    # superseded by a later full image / delete (lsn >= boundary)
    valid = (F.col(op_col) != "D") & (
        b.isNull() | (F.col(lsn_col) >= b)
    )
    vals = [
        F.max(
            F.when(
                valid & F.col(c).isNotNull(),
                F.struct(F.col(lsn_col).alias("l"), F.col(c).alias("v")),
            )
        ).over(w)["v"].alias(c)
        for c in payload_cols
    ]
    live = b.isNull() | (last_idop == "I") | (max_u > b)
    rn = F.row_number().over(
        Window.partitionBy(key).orderBy(F.col(lsn_col).desc())
    )
    return (
        ev.select(
            key,
            *vals,
            max_lsn.alias("_out_lsn"),
            live.alias("_live"),
            rn.alias("_rn"),
        )
        .filter(F.col("_live") & (F.col("_rn") == 1))
        .select(key, *payload_cols, F.col("_out_lsn").alias(lsn_col))
    )
