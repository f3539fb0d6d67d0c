"""Stateful streaming LWW dedup (streaming/stateful.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from datax_spark.datagen.generator import EventLogSpec, generate_event_log
from datax_spark.streaming.stateful import streaming_lww_dedup

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("lang", T.StringType()),
    ]
)


def test_streaming_lww_dedup_state(spark, tmp_path):
    """Across micro-batches (one file per trigger), each key emits only
    events that advance its LSN watermark; the last emission per key is
    the log's final event for that key."""
    spec = EventLogSpec(n_events=300, n_urls=40, n_domains=5, n_epochs=3, seed=21)
    shards = generate_event_log(tmp_path / "ev", spec)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "ev"))
    )
    dedup = streaming_lww_dedup(stream)
    q = (
        dedup.writeStream.format("memory")
        .queryName("lww_dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    out = spark.sql("SELECT * FROM lww_dedup_out").collect()
    assert out, "stateful operator emitted nothing"

    # reference: per-key final lsn over the full log
    import pyarrow.parquet as pq

    events = []
    for p in shards:
        events.extend(pq.read_table(p).to_pylist())
    final_lsn: dict[str, int] = {}
    for e in events:
        final_lsn[e["url"]] = max(final_lsn.get(e["url"], 0), e["lsn"])

    # emissions per key are strictly increasing in lsn (state suppressed
    # late/duplicate events), and the last emission equals the log final
    by_url: dict[str, list[int]] = {}
    for r in sorted(out, key=lambda r: r["lsn"]):
        by_url.setdefault(r["url"], []).append(r["lsn"])
    for url, lsns in by_url.items():
        assert lsns == sorted(set(lsns)), f"non-monotone emissions for {url}"
        assert lsns[-1] == final_lsn[url]
    assert set(by_url) == set(final_lsn)


def test_streaming_near_dup_across_batches(spark, tmp_path):
    """A near-duplicate arriving in a LATER micro-batch is flagged
    against the batch where its twin first appeared — bucket state
    carries signatures across triggers."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datax_spark.streaming.stateful import streaming_near_dup

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = base.replace("today", "tonight")
    other = "completely different content about spark shuffles and parquet files"
    d = tmp_path / "docs"
    d.mkdir()
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    # one file per micro-batch (maxFilesPerTrigger=1)
    pq.write_table(
        pa.Table.from_pylist(
            [{"doc_id": 0, "text": base}, {"doc_id": 1, "text": other}], schema=schema
        ),
        d / "b0.parquet",
    )
    pq.write_table(
        pa.Table.from_pylist(
            [{"doc_id": 2, "text": near}, {"doc_id": 3, "text": base}], schema=schema
        ),
        d / "b1.parquet",
    )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    out = streaming_near_dup(stream, jaccard_threshold=0.7)
    q = (
        out.writeStream.format("memory")
        .queryName("near_dup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql("SELECT * FROM near_dup_out").collect()
    pairs = {(r["matched_id"], r["doc_id"]) for r in rows}
    assert (0, 3) in pairs  # exact dup across batches
    assert (0, 2) in pairs  # near dup across batches
    assert all(r["matched_id"] < r["doc_id"] for r in rows)  # earlier-first
    assert not any(1 in p for p in pairs)  # unrelated doc never pairs
    ests = {(r["matched_id"], r["doc_id"]): r["est_jaccard"] for r in rows}
    assert ests[(0, 3)] == 1.0


def test_projection_signature_equals_aggregate_form(spark):
    """minhash_sig_cols (streaming projection) and the batch
    minhash_signatures aggregate must produce identical signatures —
    min over all tokens == min over distinct tokens."""
    from pyspark.sql import functions as F

    from datax_spark.operators.dedup import minhash_signatures, tokens
    from datax_spark.streaming.stateful import minhash_sig_cols

    df = spark.createDataFrame(
        [(0, "a b c a b"), (1, "x y"), (2, "single")],
        "doc_id long, text string",
    )
    proj = {r["doc_id"]: [r[f"mh{i}"] for i in range(8)] for r in
            df.select("doc_id", *minhash_sig_cols("text", 8)).collect()}
    agg = {r["doc_id"]: [r[f"mh{i}"] for i in range(8)] for r in
           minhash_signatures(tokens(df), 8, hash_fn="xxhash64").collect()}
    assert proj == agg
    # and the md5 contract form matches too, so streaming buckets can be
    # made byte-identical to the batch/index default by passing hash_fn
    proj_md5 = {r["doc_id"]: [r[f"mh{i}"] for i in range(8)] for r in
                df.select("doc_id", *minhash_sig_cols("text", 8, "md5")).collect()}
    agg_md5 = {r["doc_id"]: [r[f"mh{i}"] for i in range(8)] for r in
               minhash_signatures(tokens(df), 8, hash_fn="md5").collect()}
    assert proj_md5 == agg_md5


def test_streaming_near_dup_state_survives_restart(spark, tmp_path):
    """A SECOND streaming query over the same checkpoint restores bucket
    state: a twin arriving after the restart is still flagged against
    the pre-restart original."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datax_spark.streaming.stateful import streaming_near_dup

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    d = tmp_path / "docs"
    d.mkdir()
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])

    out_dir = tmp_path / "out"

    def _run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d))
        )
        q = (
            streaming_near_dup(stream, jaccard_threshold=0.7)
            .writeStream.format("parquet")  # recoverable sink (memory isn't)
            .option("path", str(out_dir))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    pq.write_table(
        pa.Table.from_pylist([{"doc_id": 0, "text": base}], schema=schema),
        d / "b0.parquet",
    )
    _run()
    assert spark.read.parquet(str(out_dir)).count() == 0  # nothing to pair yet

    # restart: new query instance, same checkpoint, new data
    pq.write_table(
        pa.Table.from_pylist([{"doc_id": 7, "text": base}], schema=schema),
        d / "b1.parquet",
    )
    _run()  # restart: new query instance, same checkpoint
    rows = spark.read.parquet(str(out_dir)).collect()
    assert {(r["matched_id"], r["doc_id"]) for r in rows} == {(0, 7)}
    assert all(r["est_jaccard"] == 1.0 for r in rows)


def test_streaming_bloom_dedup_cross_batch(spark, tmp_path):
    """Blocked-bloom streaming dedup: exact repeats flag bloom_hit in
    later batches (and later in the same batch); fresh text does not
    (up to bloom false positives — none in this tiny fixture);
    restarting from the checkpoint keeps the state."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datax_spark.streaming.stateful import streaming_bloom_dedup

    d = tmp_path / "docs"
    d.mkdir()
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    pq.write_table(
        pa.Table.from_pylist(
            [{"doc_id": 0, "text": "alpha page"},
             {"doc_id": 1, "text": "beta page"}], schema=schema
        ),
        d / "b0.parquet",
    )
    pq.write_table(
        pa.Table.from_pylist(
            [{"doc_id": 2, "text": "alpha page"},      # cross-batch dup
             {"doc_id": 3, "text": "gamma page"},
             {"doc_id": 4, "text": "gamma page"}],     # in-batch dup
            schema=schema,
        ),
        d / "b1.parquet",
    )

    out_dir = tmp_path / "out"

    def run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d))
        )
        q = (
            streaming_bloom_dedup(stream)
            .writeStream.format("parquet")  # recoverable sink (memory isn't)
            .option("path", str(out_dir))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r["doc_id"]: r["bloom_hit"]
                for r in spark.read.parquet(str(out_dir)).collect()}

    got = run()
    assert got == {0: False, 1: False, 2: True, 3: False, 4: True}

    # restart from the checkpoint: state survives — a third batch
    # repeating old text still flags
    pq.write_table(
        pa.Table.from_pylist(
            [{"doc_id": 5, "text": "beta page"},
             {"doc_id": 6, "text": "delta page"}], schema=schema
        ),
        d / "b2.parquet",
    )
    got2 = run()
    assert got2[5] is True and got2[6] is False


def test_streaming_bloom_bits_match_batch_operator(spark):
    """The stream's (block, bits) derivation is byte-identical to the
    batch bloom's, so state can seed across the two paths."""
    from pyspark.sql import functions as F

    from datax_spark.operators.bloom_dedup import bloom_terms, build_bloom

    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(50)], "doc_id long, text string"
    )
    block, bits = bloom_terms(F.col("text"), 64)
    direct = df.select(block.alias("block"), bits.alias("bits"))
    # fold per block in python == build_bloom's bit_or agg
    words: dict[int, int] = {}
    for r in direct.collect():
        words[r["block"]] = words.get(r["block"], 0) | r["bits"]
    built = {r["block"]: r["word"]
             for r in build_bloom(df, F.col("text"), 64).collect()}
    assert words == built


def test_streaming_near_dup_bounded_state(spark, tmp_path):
    """max_state_per_bucket bounds the per-bucket membership: the
    sliding window keeps the HIGHEST ids (most recent under CDC ids),
    so a twin of a long-evicted doc goes unflagged while a twin of the
    retained (newer) copy still pairs — the documented bounded-memory
    trade."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datax_spark.streaming.stateful import streaming_near_dup

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    d = tmp_path / "docs"
    d.mkdir()
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    pq.write_table(
        pa.Table.from_pylist([{"doc_id": 0, "text": base}], schema=schema),
        d / "b0.parquet",
    )
    pq.write_table(
        pa.Table.from_pylist([{"doc_id": 3, "text": base}], schema=schema),
        d / "b1.parquet",
    )
    pq.write_table(
        pa.Table.from_pylist([{"doc_id": 20, "text": base}], schema=schema),
        d / "b2.parquet",
    )
    # the file source orders micro-batches by modification time; three
    # fast writes can collide — pin distinct mtimes so b0 < b1 < b2
    import os

    for i, name in enumerate(["b0.parquet", "b1.parquet", "b2.parquet"]):
        os.utime(d / name, (1_000_000 + i, 1_000_000 + i))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    out = streaming_near_dup(
        stream, jaccard_threshold=0.7, max_state_per_bucket=1
    )
    q = (
        out.writeStream.format("memory")
        .queryName("near_dup_bounded")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM near_dup_bounded").collect()
    pairs = {(r["matched_id"], r["doc_id"]) for r in rows}
    assert (0, 3) in pairs    # flagged before 0 was evicted
    assert (3, 20) in pairs   # retained newest copy still pairs
    assert (0, 20) not in pairs  # 0 evicted once the cap hit
