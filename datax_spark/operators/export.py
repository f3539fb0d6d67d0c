"""Sharded training-data export — deterministic shards + a manifest.

The last mile of a curation pipeline: emit the corpus as N shards whose
MEMBERSHIP is a pure function of a stable key (md5-derived, so adding
hardware or re-running never reshuffles examples between shards — the
same growth-stable gate the sampling operators use), each shard written
in deterministic key order, plus a manifest row per shard (rows, bytes,
order-insensitive content hash) that a downstream loader can verify
before training starts.

Scale shape: shard assignment is a codegen projection; the write is one
exchange on the shard id (partitionBy produces one directory per
shard); the manifest is one aggregate over per-row hashes — no driver
collect of data, the manifest IS |shards| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def shard_id(key_col, n_shards: int):
    """Stable shard: first 8 md5 hex chars of the key, mod n. Pure
    function of the key — identical in any engine (the SQL form is
    ``conv(substr(md5(key),1,8),16,10) % n``)."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
    return (h.cast("long") % n_shards).alias("shard")


def export_jsonl(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    order_col: str | None = None,
) -> None:
    """Write ``shard=K/`` JSONL directories; rows within a shard are
    written in (order_col or key) order so a re-export of identical
    data is byte-identical."""
    out = df.withColumn("shard", shard_id(key_col, n_shards))
    out = out.repartition(n_shards, "shard").sortWithinPartitions(
        "shard", order_col or key_col
    )
    out.write.mode("overwrite").partitionBy("shard").json(path)


def manifest(df: DataFrame, key_col: str, n_shards: int) -> DataFrame:
    """(shard, n_rows, n_bytes, content_hash): the verification record.
    content_hash is an order-insensitive sum of per-row md5 prefixes —
    two exports of the same logical data match even if row order or
    file split differs. n_bytes is the exact on-disk size of the
    shard's JSONL files: UTF-8 octets per row plus the newline the
    writer appends (verified against real file sizes in
    tests/test_export.py)."""
    keyed = df.withColumn("shard", shard_id(key_col, n_shards))
    row_json = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    row_h = F.conv(F.substring(F.md5(row_json), 1, 15), 16, 10).cast("decimal(38,0)")
    return (
        keyed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.length(F.encode(row_json, "UTF-8")) + 1).alias("n_bytes"),
            F.sum(row_h).cast("decimal(38,0)").alias("content_hash"),
        )
    )
