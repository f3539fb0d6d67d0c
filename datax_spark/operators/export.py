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


def _attempt_token() -> str:
    """Unique-per-task-attempt suffix for staged tmp files. A retried
    or speculative attempt for the same shard must never share a tmp
    path with a concurrent attempt: two writers interleaving on one
    path can publish a corrupt file through the atomic rename even
    though each attempt's CONTENT is byte-deterministic. Called inside
    the executor function so the token reflects the running attempt."""
    try:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        if ctx is not None:
            return f"a{ctx.taskAttemptId()}"
    except Exception:
        pass
    import uuid

    return uuid.uuid4().hex[:12]


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


def export_webdataset(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    text_col: str = "text",
    meta_cols: list[str] | None = None,
) -> DataFrame:
    """WebDataset-style tar shards — the training-loader-native layout
    (one ``shard-{K:05d}.tar`` per shard; per example a ``{key}.txt``
    payload member and, when ``meta_cols`` is given, a ``{key}.json``
    sidecar member; loaders stream members sequentially, which is the
    point of the format at 100 TB: pure sequential I/O, no per-example
    object-store requests).

    Determinism: shard membership is the md5 gate (``shard_id``),
    members are written in key order with zeroed tar metadata
    (mtime/uid/gid/uname/gname, USTAR), so re-exporting identical data
    is BYTE-identical per shard — a loader can cache by shard checksum.

    Scale shape: one exchange on the shard id, then each shard's tar is
    streamed out by the executor that owns the whole group
    (applyInPandas); no driver collect. A shard must fit an executor's
    memory budget — pick ``n_shards`` so shards land at the usual
    0.1-1 GB (same sizing rule every tar/webdataset writer has).

    Returns the manifest: (shard, n_examples, n_bytes, sha256) — one
    row per written tar, computed from the bytes actually written."""
    import pandas as pd

    from pathlib import Path

    out_dir = Path(path)
    out_dir.mkdir(parents=True, exist_ok=True)
    # sweep stale staged files from prior runs' dead attempts: the
    # attempt-unique tmp names can't self-heal by overwrite the way the
    # old fixed names did, so a re-export over the same directory
    # clears orphans here. (Concurrent exports into ONE directory are
    # unsupported either way — they'd race on the final names too.)
    for stale in out_dir.glob(".tmp-*"):
        stale.unlink(missing_ok=True)
    meta_cols = list(meta_cols or [])
    cols = [key_col, text_col, *meta_cols]

    def _write_shard(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import hashlib
        import io
        import json as _json
        import tarfile

        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values(key_col, kind="mergesort")
        buf = io.BytesIO()
        n = 0
        with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tar:
            for _, row in pdf.iterrows():
                key = str(row[key_col])
                payload = ("" if row[text_col] is None else str(row[text_col])).encode()
                members = [(f"{key}.txt", payload)]
                if meta_cols:
                    meta = {
                        c: (None if pd.isna(row[c]) else row[c]) for c in meta_cols
                    }
                    members.append(
                        (f"{key}.json", _json.dumps(meta, sort_keys=True).encode())
                    )
                for name, data in members:
                    info = tarfile.TarInfo(name)
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tar.addfile(info, io.BytesIO(data))
                n += 1
        blob = buf.getvalue()
        dest = out_dir / f"shard-{shard:05d}.tar"
        tmp = out_dir / f".tmp-{shard:05d}-{_attempt_token()}.tar"
        tmp.write_bytes(blob)
        tmp.replace(dest)
        return pd.DataFrame(
            {
                "shard": [shard],
                "n_examples": [n],
                "n_bytes": [len(blob)],
                "sha256": [hashlib.sha256(blob).hexdigest()],
            }
        )

    keyed = df.select(*cols).withColumn("shard", shard_id(key_col, n_shards))
    return (
        keyed.groupBy("shard")
        .applyInPandas(
            _write_shard,
            "shard long, n_examples long, n_bytes long, sha256 string",
        )
        .orderBy("shard")
    )


def export_incremental(
    table,
    out_dir: str,
    from_version: int,
    to_version: int | None = None,
    n_shards: int = 8,
    text_col: str = "text",
    meta_cols: list[str] | None = None,
) -> DataFrame:
    """Delta export between two table snapshots — re-exporting 100 TB
    because 0.1% of pages re-crawled is the waste this kills. The
    changelog (semantic diff: cost scales with CHANGED partitions, see
    IceTable.read_changes) drives two artifacts under
    ``<out>/delta-v{from}-v{to}/``:

    * upserts (I/U rows) as the same byte-deterministic WebDataset
      shards the full export writes — a consumer merges by key;
    * ``tombstones-NNNNN.jsonl`` — the deleted keys, SHARDED by the
      same ``shard_id`` as the data shards and written executor-side
      (an earlier revision collected every delete key to the driver —
      a retention sweep or purge wave makes that set millions of keys,
      the textbook driver bottleneck at 100×; now only the
      manifest-row counts reach the driver). A consumer drops every
      key listed in any tombstone file (an incremental format without
      deletes silently resurrects removed training data). Each file is
      byte-deterministic: keys sorted within shard, sort_keys json.

    Returns the shard manifest plus one ``shard = -(s+1)`` row per
    tombstone shard (count/bytes/sha256 — same verification contract
    as the data shards). Consumer contract (tested): full_export(v0)
    + deltas applied in order ≡ full_export(vN), byte-for-byte per
    document.

    LAZINESS CONTRACT: collecting the returned manifest IS the export.
    Both the data shards (export_webdataset) and the tombstone files
    are written executor-side as a side effect of evaluating the
    manifest DataFrame — a caller that drops the return value writes
    nothing, and re-materializing the manifest rewrites the files
    (harmless: content is byte-deterministic and each attempt stages
    to an attempt-unique tmp before the atomic rename)."""
    import hashlib
    import json as _json

    from pathlib import Path

    import pandas as pd

    to_version = table.current_version() if to_version is None else to_version
    key_col = table.key_column
    dest = Path(out_dir) / f"delta-v{from_version}-v{to_version}"
    dest.mkdir(parents=True, exist_ok=True)
    for stale in dest.glob(".tmp-*"):  # orphans of prior dead attempts
        stale.unlink(missing_ok=True)
    feed = table.read_changes(from_version, to_version)
    ups = feed.filter(F.col("_op").isin("I", "U"))
    man = export_webdataset(
        ups, str(dest), key_col, n_shards, text_col=text_col, meta_cols=meta_cols
    )
    dels = (
        feed.filter(F.col("_op") == "D")
        .select(key_col)
        .withColumn("shard", shard_id(key_col, n_shards))
    )

    def _write_tomb(pdf: "pd.DataFrame") -> "pd.DataFrame":
        shard = int(pdf["shard"].iloc[0])
        keys = sorted(
            k.item() if hasattr(k, "item") else k for k in pdf[key_col]
        )
        blob = "".join(
            _json.dumps({key_col: k}, sort_keys=True) + "\n" for k in keys
        ).encode()
        tmp = dest / f".tmp-tomb-{shard:05d}-{_attempt_token()}.jsonl"
        tmp.write_bytes(blob)
        tmp.replace(dest / f"tombstones-{shard:05d}.jsonl")
        return pd.DataFrame(
            {
                "shard": [-(shard + 1)],
                "n_examples": [len(keys)],
                "n_bytes": [len(blob)],
                "sha256": [hashlib.sha256(blob).hexdigest()],
            }
        )

    tomb_man = dels.groupBy("shard").applyInPandas(
        _write_tomb, "shard long, n_examples long, n_bytes long, sha256 string"
    )
    return man.unionByName(tomb_man).orderBy("shard")


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
