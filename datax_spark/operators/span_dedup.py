"""Exact-substring (duplicate-span) dedup — the token-window form of
"Deduplicating Training Data Makes Language Models Better" (Lee et al.
2022, public methodology): detect n-token windows that occur more than
once ACROSS the corpus, and optionally cut every repeated occurrence
except the first, keeping document remainders.

This is the third dedup granularity the engine offers: document-level
(exact/MinHash/SimHash, operators/dedup.py), line-level (C4/CCNet
line_dedup_corpus), and this span level — boilerplate paragraphs,
license blocks and templated passages duplicate across otherwise
distinct pages, which document- and line-level passes both miss.

Scale shape (the suffix-array of the paper doesn't distribute; the
standard large-scale substitute is hashed shingle windows):
  - window hashes are a PROJECTION over the token array (one
    `transform(sequence(...))` per doc — no explode until the
    aggregation needs rows);
  - the only corpus-sized shuffles are the window-hash aggregate
    (map-side combinable count / min-occurrence) and the semi-join of
    spans against the duplicated-hash set — both keyed on the hash, so
    they partition uniformly by construction;
  - removal never shuffles the TEXT: token cutting happens in a
    per-doc projection against a (doc-local) sorted cut list collected
    per row, not a corpus-wide token table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _span_frame(
    docs: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, n_tokens, pos, h): every n-token window's md5 hash with its
    0-based start position. Docs shorter than n contribute no rows."""
    tk = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    wins = F.transform(
        F.sequence(F.lit(1), F.size("_tk") - n + 1),
        lambda i: F.md5(F.array_join(F.slice("_tk", i, n), " ")),
    )
    return (
        docs.select(F.col(id_col), tk.alias("_tk"))
        .filter(F.size("_tk") >= n)
        .select(
            id_col,
            F.size("_tk").alias("n_tokens"),
            F.posexplode(wins).alias("pos", "h"),
        )
    )


def duplicate_span_stats(
    docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document span-duplication report: (id, n_windows,
    n_dup_windows, dup_frac) where a window is "dup" iff its n-token
    content occurs anywhere else in the corpus (including elsewhere in
    the same document). Every input doc gets a row; docs shorter than
    ``n`` tokens have 0 windows and 0.0 dup_frac — the per-doc gate a
    curation pipeline thresholds on (high dup_frac ⇒ boilerplate)."""
    spans = _span_frame(docs, n, id_col, text_col)
    dup = (
        spans.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .select("h")
    )
    per_doc = (
        spans.join(dup, "h", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_dup_windows"))
    )
    tk = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    base = docs.select(
        id_col,
        F.greatest(F.size(tk) - n + 1, F.lit(0)).cast("bigint").alias("n_windows"),
    )
    return base.join(per_doc, id_col, "left").select(
        id_col,
        "n_windows",
        F.coalesce("n_dup_windows", F.lit(0)).cast("bigint").alias("n_dup_windows"),
        F.when(F.col("n_windows") > 0,
               F.round(F.coalesce("n_dup_windows", F.lit(0))
                       / F.col("n_windows"), 4))
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )


def remove_duplicate_spans(
    docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cut every occurrence of a corpus-duplicated n-token window EXCEPT
    the globally first one — "first" = the minimum (id, pos) occurrence,
    deterministic and replay-stable. A token is removed when ANY
    non-keeper duplicated window covers it; overlapping cut windows
    merge naturally through per-token coverage. Returns
    (id, text, n_tokens_kept, n_tokens_cut) with the rebuilt text —
    docs losing every token keep an empty string (the downstream
    quality gate drops them; silently vanishing rows would break
    row-count accounting).

    The cut list returns to each doc as (start, end) RANGES — O(cut
    windows), never exploded to per-token rows corpus-wide; the token
    drop itself is an array filter in the final projection."""
    spans = _span_frame(docs, n, id_col, text_col)
    keeper = (
        spans.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.min(F.struct(id_col, "pos")).alias("keep"),
        )
        .filter(F.col("c") > 1)
        .select("h", "keep")
    )
    cuts = (
        spans.join(keeper, "h")
        .filter(
            (F.col(id_col) != F.col(f"keep.{id_col}"))
            | (F.col("pos") != F.col("keep.pos"))
        )
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("cut_starts"))
    )
    tk = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    covered = lambda idx: F.exists(
        "cut_starts", lambda s: (s <= idx) & (idx < s + n)
    )
    kept = F.filter(
        F.transform("_tk", lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda s: ~covered(s["i"]),
    )
    out = (
        docs.select(F.col(id_col), tk.alias("_tk"))
        .join(cuts, id_col, "left")
        .withColumn("cut_starts", F.coalesce("cut_starts", F.array()))
        .select(
            id_col,
            F.array_join(
                F.transform(kept, lambda s: s["t"]), " "
            ).alias(text_col),
            F.size(kept).cast("bigint").alias("n_tokens_kept"),
            (F.size("_tk") - F.size(kept)).cast("bigint").alias("n_tokens_cut"),
        )
    )
    return out
