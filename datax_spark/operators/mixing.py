"""Corpus mixing — per-source sampling weights that reshape a crawl's
natural token distribution into a target mix (the "data mixture" step
of every LLM training-data pipeline: DoReMi-style reweighting, The
Pile's per-subset epochs, Llama's sampling proportions all reduce to
this computation followed by a weighted sampler).

Given per-source target shares (or uniform by default), compute for
each source the sampling probability ``p ≤ 1`` such that sampled token
counts land proportional to the targets, anchored so the
most-oversubscribed source keeps everything (no upsampling — this is a
downsampling mix; sources whose natural share is below target keep
p = 1 and the achieved mix is renormalized over what exists).

Then ``apply_mix`` turns the weights into an actual sampled corpus via
the same md5-gate as ``operators/sampling.deterministic_sample`` —
deterministic membership, growth-stable, reproducible in SQL.

Scale shape: the stats pass is one map-side-combined groupBy(source)
(output = |sources| rows, tiny); the weights table broadcasts back onto
the corpus for the gate — the corpus itself never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datax_spark.functions.text import ws_token_count


def mixing_weights(
    df: DataFrame,
    targets: dict[str, float] | None = None,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source, tokens, natural_share, target_share, sample_p) —
    ``sample_p`` = min(1, (target/natural) / max_over_sources(target/
    natural)): the most-over-target source is fully kept and every
    other source is downsampled in proportion, which maximizes retained
    tokens subject to hitting the target RATIOS exactly. Sources absent
    from ``targets`` get target 0 → sample_p 0 (dropped)."""
    stats = df.groupBy(source_col).agg(
        F.sum(ws_token_count(F.col(text_col))).cast("long").alias("tokens")
    )
    total = F.sum("tokens").over(Window_all())
    if targets is None:
        n_src = F.count(F.lit(1)).over(Window_all())
        tgt = 1.0 / n_src
    else:
        mapping = F.create_map(
            *[F.lit(x) for kv in targets.items() for x in kv]
        )
        tgt = F.coalesce(mapping[F.col(source_col)], F.lit(0.0))
    w = stats.select(
        source_col,
        "tokens",
        (F.col("tokens") / total).alias("natural_share"),
        tgt.alias("target_share"),
    ).withColumn(
        "_ratio",
        F.when(
            F.col("natural_share") > 0,
            F.col("target_share") / F.col("natural_share"),
        ).otherwise(F.lit(0.0)),
    )
    max_ratio = F.max("_ratio").over(Window_all())
    return w.select(
        source_col,
        "tokens",
        F.round("natural_share", 6).alias("natural_share"),
        F.round("target_share", 6).alias("target_share"),
        F.round(
            F.when(max_ratio > 0, F.least(F.lit(1.0), F.col("_ratio") / max_ratio))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("sample_p"),
    )


def Window_all():
    """A global window (single frame over all rows) — used only over
    the |sources|-row stats table, never the corpus."""
    from pyspark.sql import Window

    return Window.partitionBy()


def apply_mix(
    df: DataFrame,
    weights: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sample the corpus to the mix: broadcast-join ``weights`` and keep
    rows whose md5-gate (on the doc id, salted by source so per-source
    gates are independent) falls under ``sample_p``. Gate granularity is
    1/16^6 ≈ 6e-8, deterministic across runs and engines."""
    gate = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col(source_col), F.col(id_col).cast("string"))),
                1, 6,
            ),
            16, 10,
        ).cast("bigint")
        / F.lit(float(16 ** 6))
    )
    return (
        df.join(F.broadcast(weights.select(source_col, "sample_p")), source_col)
        .filter(gate < F.col("sample_p"))
        .select(*df.columns)
    )
