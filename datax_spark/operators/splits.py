"""Leakage-safe train/val/test splits — split by near-dup CLUSTER, not
by document, so no near-duplicate pair ever straddles train and test.

The failure this prevents: a per-doc hash split puts one copy of a
boilerplate page in train and its near-duplicate in test, and the
benchmark silently measures memorization. The published fix (used by
every serious LM data pipeline) is to split on the near-dup equivalence
class: all members of a cluster inherit ONE deterministic gate drawn
from the cluster id.

Spark shape: the pair graph comes from any of the engine's near-dup
operators (MinHash-LSH by default); connected components collapse it to
(doc, cluster) — the component table only contains docs that appear in
at least one pair, a small fraction of the corpus, so it broadcasts
back onto the corpus (singletons fall through to their own id via
coalesce, costing nothing). The split gate is the md5-prefix integer of
the cluster id — deterministic, replay-stable, reproducible in the
driver's DuckDB oracle, and growth-stable for docs whose cluster
membership doesn't change (an honest caveat: a NEW doc that bridges two
existing clusters re-labels the higher one — any cluster-aware split
has that property; re-split after major corpus growth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datax_spark.operators import dedup as DD


def _gate(cluster: F.Column, seed: str, mod: int = 10_000) -> F.Column:
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed), cluster.cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return h % mod


def cluster_split(
    df: DataFrame,
    pairs: DataFrame,
    fractions: tuple[float, float, float] = (0.8, 0.1, 0.1),
    seed: str = "split",
    id_col: str = "doc_id",
    broadcast_components: bool = True,
) -> DataFrame:
    """(id, cluster_id, split) for every row of ``df``: cluster_id = the
    min id reachable through ``pairs`` edges (docs in no pair are their
    own cluster), split drawn from md5(seed || cluster_id) at the given
    (train, val, test) fractions. All members of a cluster land in the
    same split by construction — for EVERY component shape: clustering
    runs the convergence-checked star-contraction CC (no round bound),
    so a >4-hop near-dup chain can no longer straddle train and test.

    ``broadcast_components=False`` falls back to a shuffled join for
    the pathological case where MOST of the corpus sits in near-dup
    pairs (the component table is no longer executor-memory-sized);
    normal web corpora keep it broadcastable."""
    if abs(sum(fractions) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {fractions}")
    comp = DD.connected_components(pairs).withColumnRenamed(
        "doc_id", id_col
    )
    if broadcast_components:
        comp = F.broadcast(comp)
    assigned = df.select(id_col).join(comp, id_col, "left").select(
        id_col,
        F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"),
    )
    g = _gate(F.col("cluster_id"), seed)
    t_hi = int(round(fractions[0] * 10_000))
    v_hi = t_hi + int(round(fractions[1] * 10_000))
    split = (
        F.when(g < t_hi, F.lit("train"))
        .when(g < v_hi, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return assigned.select(id_col, "cluster_id", split.alias("split"))


def leakage_safe_split(
    df: DataFrame,
    fractions: tuple[float, float, float] = (0.8, 0.1, 0.1),
    seed: str = "split",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """The one-call form: MinHash-LSH near-dup pairs → cluster split.
    Same parameters as ``dedup.minhash_lsh_pairs``; see
    :func:`cluster_split` for the contract."""
    pairs = DD.minhash_lsh_pairs(
        df, k=k, bands=bands, jaccard_threshold=jaccard_threshold,
        id_col=id_col, text_col=text_col,
    )
    return cluster_split(df, pairs, fractions, seed, id_col)
