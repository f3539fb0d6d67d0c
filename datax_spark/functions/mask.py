"""Column masking — policy-driven de-identification for shared reads.

The governance counterpart to `purge_keys` (erasure) and `redact_pii`
(content scrubbing): a table is SERVED to a less-privileged consumer
with per-column policies applied, without copying or mutating data.
All policies are codegen expressions (no UDFs), so a masked read plans
exactly like the unmasked one plus a projection:

* ``hash``    — md5 of the value: referentially stable (joins and
                group-bys on the masked column still work across
                tables masked with the same policy) but irreversible.
* ``null``    — the column reads as NULL (type preserved).
* ``redact``  — PII patterns replaced (functions/pii.redact_pii).
* ``last4``   — all but the last 4 characters replaced with ``*``
                (the account-number convention).
* ``domain``  — URLs collapsed to their host: keeps cohort analytics
                while dropping the page-level trail.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mask_expr(col: Column, policy: str) -> Column:
    if policy == "hash":
        return F.md5(col.cast("string"))
    if policy == "null":
        return F.lit(None).cast("string")
    if policy == "redact":
        from datax_spark.functions.pii import redact_pii

        return redact_pii(col)
    if policy == "last4":
        s = col.cast("string")
        return F.when(
            F.length(s) <= 4, s
        ).otherwise(
            F.concat(
                F.repeat(F.lit("*"), F.length(s) - 4), F.substring(s, -4, 4)
            )
        )
    if policy == "domain":
        from datax_spark.functions.url import url_domain

        return url_domain(col)
    raise ValueError(
        f"unknown mask policy {policy!r} "
        "(use hash | null | redact | last4 | domain)"
    )


def masked_view(df: DataFrame, policies: dict[str, str]) -> DataFrame:
    """Apply per-column policies; unlisted columns pass through. Raises
    on a policy for a column the frame doesn't have — a silently
    ignored policy is a leak, not a convenience."""
    missing = set(policies) - set(df.columns)
    if missing:
        raise ValueError(
            f"mask policies for absent column(s) {sorted(missing)} — "
            f"frame has {sorted(df.columns)}"
        )
    return df.select(
        *[
            mask_expr(F.col(c), policies[c]).alias(c) if c in policies else F.col(c)
            for c in df.columns
        ]
    )
