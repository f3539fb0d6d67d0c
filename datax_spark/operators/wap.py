"""Write-audit-publish (WAP) — gated epoch publishes, the Iceberg
production pattern for "never let a bad batch reach readers".

Flow: the epoch is applied through the normal exactly-once MERGE path
(so its snapshot, ledger entry, and lineage are all real), but readers
never follow "current" — they follow the ``prod`` tag. The post-image
is audited with the expectations engine (one fused aggregate pass);
on pass the ``prod`` tag fast-forwards to the new snapshot, on fail
the table ROLLS BACK to the pre-image (a new restoring version,
Iceberg-style — history is never rewritten) and ``prod`` never moves.
Because rollback restores the commit ledger, a REPAIRED batch can
re-use the same epoch number afterwards — the failed attempt leaves no
ledger shadow.

Scale shape: the audit is `expectations.check` — ONE aggregate job over
the post-image (optionally restricted to the epoch's affected
partitions via the table's partition pruning); the tag moves and
rollback are metadata-only CAS commits, O(P) regardless of table size.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from datax_spark.icetable.table import IceTable
from datax_spark.operators.expectations import Expect, check
from datax_spark.operators.merge import apply_epoch


def wap_apply(
    table: IceTable,
    batch_df: DataFrame,
    epoch: int,
    checks: Sequence[Expect],
    prod_tag: str = "prod",
    audit_affected_only: bool = False,
    key_col: str = "url",
    **apply_kw,
) -> dict:
    """Apply ``batch_df`` as ``epoch``, audit, publish-or-rollback.

    Returns ``{"published": bool, "version": int, "audit": [check rows],
    "epoch": int, "stats": EpochStats}`` where ``version`` is the
    snapshot readers of ``prod_tag`` now see. ``audit_affected_only``
    audits just the partitions the epoch touched (partition-pruned scan
    of pmod(murmur3(key), P) over the batch's keys) instead of the
    whole post-image — the 100-TB setting where a full post-image pass
    per epoch would be O(table).
    """
    if prod_tag not in table.refs():
        table.tag(prod_tag, table.current_version())  # bootstrap: pin pre-image
    # pre-image anchor AFTER any bootstrap tag publish (tagging bumps the
    # metadata version), so skip detection and rollback target the state
    # immediately before the apply
    base_version = table.current_version()
    stats = apply_epoch(table, batch_df, epoch, **apply_kw)
    v_new = table.current_version()
    if stats.skipped or v_new == base_version:
        # replayed/empty epoch: nothing new to audit or publish
        return {
            "published": False,
            "version": table.refs()[prod_tag],
            "audit": [],
            "epoch": epoch,
            "stats": stats,
        }
    if audit_affected_only:
        from pyspark.sql import functions as F

        from datax_spark.functions.hashing import url_partition

        pids = {
            r["p"]
            for r in batch_df.select(
                url_partition(F.col(key_col), table.num_partitions).alias("p")
            )
            .distinct()
            .collect()
            if r["p"] is not None
        }
        post, _ = table.read_partitions(pids)
    else:
        post = table.read()
    audit = [r.asDict() for r in check(post, checks).collect()]
    if all(r["passed"] for r in audit):
        table.tag(prod_tag, v_new)
        return {
            "published": True,
            "version": v_new,
            "audit": audit,
            "epoch": epoch,
            "stats": stats,
        }
    # audit failed: restore the pre-image (new version, history kept);
    # the restored ledger forgets this epoch, so a repaired batch can
    # legitimately re-use the epoch number.
    table.rollback(base_version)
    return {
        "published": False,
        "version": table.refs()[prod_tag],
        "audit": audit,
        "epoch": epoch,
        "stats": stats,
    }


def wap_read(table: IceTable, prod_tag: str = "prod") -> DataFrame:
    """What consumers read: the last AUDITED snapshot."""
    return table.read(version=prod_tag)
