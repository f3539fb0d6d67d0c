"""Vocabulary tokenizer: corpus-frequency vocab + token-id encoding with
hashed OOV buckets (the feature-hashing fallback every production
text pipeline uses when a token misses the vocab).

Shape for 100 TB: the vocab is a distributed top-N over token counts
(map-side-combined count agg, then TakeOrdered — no full sort), small
enough to BROADCAST; encoding is one narrow projection + broadcast join,
no corpus shuffle. OOV ids are md5-derived (the repo's portable bucket
idiom) so the DuckDB oracle reproduces them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _md5_bucket(col: Column, n: int) -> Column:
    """Portable deterministic bucket (same expression family as
    hash_bucket_histogram): first 4 md5 hex digits as an int, mod n."""
    return F.conv(F.substring(F.md5(col), 1, 4), 16, 10).cast("bigint") % n


def token_positions(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, pos, tok) — whitespace split, empties dropped, pos 0-based
    over the FILTERED sequence (both engines filter before numbering)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    return df.select(F.col(id_col), F.posexplode(toks).alias("pos", "tok"))


def build_vocab(
    df: DataFrame,
    size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_freq: int = 1,
) -> DataFrame:
    """Top-``size`` tokens by (count desc, token asc): (tok, token_id)
    with ids 0..size-1 in rank order. The order is total, so the vocab
    is deterministic and engine-independent."""
    counts = (
        token_positions(df, id_col, text_col)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_freq)
    )
    top = counts.orderBy(F.col("n").desc(), F.col("tok").asc()).limit(size)
    w = Window.orderBy(F.col("n").desc(), F.col("tok").asc())
    return top.select(
        "tok", (F.row_number().over(w) - 1).cast("bigint").alias("token_id")
    )


def encode(
    df: DataFrame,
    vocab: DataFrame,
    vocab_size: int,
    oov_buckets: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-id sequence rows: (id, pos, token_id, is_oov). In-vocab
    tokens map to their rank id; OOV tokens land in
    ``vocab_size + md5_bucket(tok) % oov_buckets`` — stable under vocab
    growth (ids 0..size-1 never collide with OOV ids)."""
    tp = token_positions(df, id_col, text_col)
    joined = tp.join(F.broadcast(vocab), "tok", "left")
    oov_id = F.lit(vocab_size) + _md5_bucket(F.col("tok"), oov_buckets)
    return joined.select(
        F.col(id_col),
        F.col("pos").cast("bigint").alias("pos"),
        F.coalesce(F.col("token_id"), oov_id).cast("bigint").alias("token_id"),
        F.col("token_id").isNull().cast("int").alias("is_oov"),
    )
