"""URL / domain blocklist filtering — the UT1-blocklist-style gate every
web-corpus pipeline runs before content-quality scoring (RefinedWeb,
CCNet, and C4 all drop by domain + URL pattern before reading a byte of
HTML; DataX's reader-side `where` plays the same drop-early role for
RDBMS sources).

Two rule kinds, applied in a fixed precedence:

1. **domain blocklist** — a table of blocked registrable domains
   (UT1-scale: millions of rows). Matching is on the canonicalized
   host (``functions/url.canonical_url`` semantics: lowercased,
   ``www.`` stripped) and on any parent domain suffix (blocking
   ``example.com`` blocks ``a.b.example.com``).
2. **pattern rules** — a short ordered list of regexes over the full
   canonical URL (path-keyword blocks, file-extension blocks).

Verdict precedence: ``blocked_domain`` > ``blocked_pattern`` > ``kept``.

Scale shape: the corpus NEVER shuffles. Suffix matching is ``max_labels``
(≤5) consecutive BroadcastHashJoins against the one deduped blocklist
relation — same per-row probe count as an explode-and-regroup (each URL
probes each of its parent suffixes once) but with zero exchanges: the
plan is scan → k broadcast probes → project, one stage end to end.
The blocklist broadcast is a few hundred MB of domain strings at UT1
scale — executor-memory-sized by design. Pattern rules are pure codegen
``rlike`` expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datax_spark.functions.url import canonical_url, url_parts


def domain_suffix(host_col, depth: int):
    """The ``depth``-label suffix of a host (depth=1 → TLD, 2 →
    registrable domain, …); null when the host has fewer labels, so a
    short host probes each of its suffixes exactly once."""
    labels = F.split(host_col, "\\.", -1)
    n = F.size(labels)
    return F.when(
        n >= depth, F.array_join(F.slice(labels, n - depth + 1, depth), ".")
    )


def blocklist_filter(
    df: DataFrame,
    blocked_domains: DataFrame,
    pattern_rules: list[str] | None = None,
    url_col: str = "url",
    max_labels: int = 5,
    assume_distinct: bool = False,
) -> DataFrame:
    """Input columns + ``canon_url`` + ``verdict`` ∈ {kept,
    blocked_domain, blocked_pattern}. ``blocked_domains`` must expose a
    ``domain`` string column (pre-canonicalized: lowercase, no www).
    ``assume_distinct=True`` skips the blocklist's dedup shuffle (a
    blocklist-sized exchange, never the corpus) when the caller
    guarantees unique domains — a duplicate domain would otherwise
    duplicate every URL it matches."""
    pattern_rules = pattern_rules or []
    # matching is on the HOSTNAME alone: strip userinfo and ANY port
    # (not just default ports — "spam.example:8080" must still match a
    # "spam.example" blocklist entry), then www.
    host = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.lower(url_parts(F.col(url_col))["host"]), "^[^@]*@", ""
            ),
            ":[0-9]*$", "",
        ),
        "^www\\.", "",
    )
    out = df.withColumn("canon_url", canonical_url(F.col(url_col))).withColumn(
        "_host", host
    )
    blk = blocked_domains.select(F.col("domain").cast("string").alias("domain"))
    if not assume_distinct:
        blk = blk.distinct()
    blk = blk.withColumn("_blk", F.lit(True))
    hit = F.lit(False)
    for depth in range(1, max_labels + 1):
        b = F.broadcast(blk.select(
            F.col("domain").alias(f"_d{depth}"), F.col("_blk").alias(f"_b{depth}")
        ))
        out = out.join(
            b, domain_suffix(F.col("_host"), depth) == F.col(f"_d{depth}"), "left"
        ).drop(f"_d{depth}")
        hit = hit | F.coalesce(F.col(f"_b{depth}"), F.lit(False))
    pat = F.lit(False)
    for rx in pattern_rules:
        pat = pat | F.col("canon_url").rlike(rx)
    return out.select(
        *df.columns,
        "canon_url",
        F.when(hit, "blocked_domain")
        .when(pat, "blocked_pattern")
        .otherwise("kept")
        .alias("verdict"),
    )
