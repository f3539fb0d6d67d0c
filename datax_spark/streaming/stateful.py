"""Custom stateful streaming operator: per-key LWW watermark state via
``applyInPandasWithState`` (SURVEY.md §2.8; the task brief's pattern for
operators Structured Streaming lacks natively).

The epoch driver resolves LWW *within* each batch and relies on the
sink's per-row lsn guard *across* batches. This operator is the pure-
streaming alternative: keep each key's max applied LSN in Spark state,
emit only events that advance it (true cross-batch dedup at the source,
before any sink work). At 10^10 events the state is one long per live
key, partitioned by the groupBy key — RocksDB-backed on a real cluster.

Used with a streaming DataFrame::

    dedup = streaming_lww_dedup(stream_df)
    dedup.writeStream.foreachBatch(...)...

GroupState contract: state holds (max_lsn,); events with lsn <= state
are late/replayed duplicates and are dropped; ties drop (idempotent
replay). Timeouts are not used — CDC state lives as long as the key.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([T.StructField("max_lsn", T.LongType())])


def _dedup_fn(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (max_lsn,) = state.get if state.exists else (0,)
    out = []
    for pdf in batches:
        pdf = pdf[pdf["lsn"] > max_lsn]
        if len(pdf):
            # within-batch LWW: keep only the final event per key
            winner = pdf.loc[[pdf["lsn"].idxmax()]]
            max_lsn = int(winner["lsn"].iloc[0])
            out.append(winner)
    if out:
        state.update((max_lsn,))
        # later micro-batch chunks for the same key supersede earlier
        # ones; emit only the final winner
        yield out[-1]


def streaming_lww_dedup(
    events: DataFrame, key: str = "url", output_schema: T.StructType | None = None
) -> DataFrame:
    """Cross-batch LWW dedup over a streaming DataFrame: one output row
    per (micro-batch, key) — the max-LSN event not yet applied — with
    the per-key LSN watermark held in Spark state."""
    schema = output_schema or events.schema
    return (
        events.groupBy(key)
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=schema,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ------------------------------------------------------------------ #
# streaming near-dup: MinHash-LSH state per band bucket
# ------------------------------------------------------------------ #

NEARDUP_STATE = T.StructType(
    [T.StructField("entries", T.ArrayType(T.StringType()))]
)

NEARDUP_OUTPUT = T.StructType(
    [
        T.StructField("bucket", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("matched_id", T.LongType()),
        T.StructField("est_jaccard", T.DoubleType()),
    ]
)


def minhash_sig_cols(text_col, k: int = 8, hash_fn: str = "xxhash64") -> list:
    """Per-doc MinHash signature as PURE projection (no explode/groupBy):
    mh_i = min over tokens of hash(token, i). Equivalent to the batch
    aggregate form (min ignores duplicate tokens) but streaming-safe —
    chains straight into a stateful operator with no intervening
    aggregation. Empty docs get null signatures (filtered by callers).

    ``hash_fn`` mirrors operators/dedup.minhash_signatures so buckets
    can match byte-identically across the one-shot, indexed, and
    streaming implementations — but the DEFAULTS differ on purpose:
    streaming defaults to ``xxhash64`` (production: one JVM op per
    (token, seed)), batch defaults to ``md5`` (the DuckDB-oracle
    contract). Pass the same value on both sides when comparing."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    text = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.filter(F.split(text, " "), lambda t: t != "")
    if hash_fn == "xxhash64":
        h = lambda t, i: F.xxhash64(t, F.lit(i))
    elif hash_fn == "md5":
        h = lambda t, i: F.md5(F.concat(F.lit(f"{i}:"), t))
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    return [
        F.array_min(F.transform(toks, lambda t: h(t, i))).alias(f"mh{i}")
        for i in range(k)
    ]


def _make_neardup_fn(k: int, threshold: float, max_state: int | None = None):
    def fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        bucket = key[0]
        entries = list(state.get[0]) if state.exists else []
        stored = [e.split("|") for e in entries]  # [id, mh0..mh{k-1}]
        rows = []
        for pdf in batches:
            # arrival order within a micro-batch is partition-order
            # nondeterministic — sort by id so replay emits identically
            pdf = pdf.sort_values("doc_id")
            for r in pdf.itertuples(index=False):
                sig = [str(getattr(r, f"mh{i}")) for i in range(k)]
                for s in stored:
                    matches = sum(a == b for a, b in zip(sig, s[1:]))
                    est = round(matches / k, 4)
                    if est >= threshold:
                        rows.append((bucket, r.doc_id, int(s[0]), est))
                stored.append([str(r.doc_id)] + sig)
                entries.append("|".join([str(r.doc_id)] + sig))
        if max_state is not None and len(entries) > max_state:
            # bounded-state mode: keep the max_state HIGHEST doc ids —
            # with monotone-ish CDC ids that is "most recent", and the
            # keep-set is a pure function of the ids seen, so replay
            # from any checkpoint evicts identically (a time- or
            # arrival-based eviction would not)
            order = sorted(
                range(len(entries)),
                key=lambda i: int(stored[i][0]),
                reverse=True,
            )[:max_state]
            entries = [entries[i] for i in sorted(order)]
        state.update((entries,))
        if rows:
            yield pd.DataFrame(rows, columns=["bucket", "doc_id", "matched_id", "est_jaccard"])

    return fn


def streaming_near_dup(
    docs: DataFrame,
    k: int = 8,
    bands: int = 4,
    jaccard_threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
    max_state_per_bucket: int | None = None,
) -> DataFrame:
    """Cross-batch near-duplicate detection over a streaming DataFrame —
    the streaming twin of operators/dedup_index.MinHashIndex: signatures
    are a codegen projection, band buckets the shuffle key, and each
    bucket's seen signatures live in Spark state (RocksDB-backed on a
    cluster). Emits (bucket, doc_id, matched_id, est_jaccard) whenever a
    new doc's signature agrees with a stored one on ≥ threshold of the k
    hashes — a doc pairing in several buckets emits once per bucket
    (dedup downstream if exact pair sets matter; detection usually
    drops on first match).

    State per bucket is O(docs that ever hit the bucket); at web scale
    the band hash spreads buckets uniformly, so state partitions evenly
    across executors — but it GROWS FOREVER on an infinite stream.
    ``max_state_per_bucket`` bounds it: each bucket keeps only the N
    highest doc ids (= most recent under monotone CDC ids), trading
    pairs against long-evicted docs for O(N) state — the standard
    sliding-window near-dup shape. Eviction is a pure function of the
    ids seen, so checkpoint replay evicts identically. The per-bucket comparison loop runs in pandas over
    the (small) bucket membership — the corpus-side work (hashing,
    banding) stays JVM-side."""
    from pyspark.sql import functions as F

    from datax_spark.operators.dedup import band_bucket_exprs

    if k % bands:
        raise ValueError(f"bands={bands} must divide k={k}")
    sig = docs.select(
        F.col(id_col).alias("doc_id"), *minhash_sig_cols(text_col, k, hash_fn)
    )
    sig = sig.filter(F.col("mh0").isNotNull())  # empty docs have no signature
    bucketed = sig.select(
        "doc_id", *[F.col(f"mh{i}") for i in range(k)],
        F.explode(F.array(*band_bucket_exprs(k, bands))).alias("bucket"),
    )
    return bucketed.groupBy("bucket").applyInPandasWithState(
        _make_neardup_fn(k, jaccard_threshold, max_state_per_bucket),
        outputStructType=NEARDUP_OUTPUT,
        stateStructType=NEARDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------------------------ #
# streaming exact-dup detection: blocked bloom state per block
# ------------------------------------------------------------------ #

BLOOM_STATE = T.StructType([T.StructField("word", T.LongType())])

BLOOM_OUTPUT = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("block", T.LongType()),
        T.StructField("bloom_hit", T.BooleanType()),
    ]
)


def _bloom_fn(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (word,) = state.get if state.exists else (0,)
    block = key[0]
    # buffer the group's Arrow chunks and sort ONCE: a per-chunk sort
    # would leave cross-chunk order at shuffle-arrival order, breaking
    # the deterministic "earlier-by-doc_id is seen first" guarantee for
    # blocks larger than arrow.maxRecordsPerBatch
    chunks = list(batches)
    if not chunks:  # timeout-only invocation: nothing to emit
        return
    pdf = pd.concat(chunks, ignore_index=True).sort_values("doc_id")
    hits = []
    for bits in pdf["bits"].astype("int64"):
        hits.append((word & int(bits)) == int(bits))
        word |= int(bits)
    state.update((int(word),))
    yield pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].values,
            "block": block,
            "bloom_hit": hits,
        }
    )


def streaming_bloom_dedup(
    docs: DataFrame,
    key_col: str = "text",
    id_col: str = "doc_id",
    n_blocks: int = 1024,
) -> DataFrame:
    """Cross-batch exact-dup DETECTION with bounded state: the streaming
    form of ``operators/bloom_dedup`` — each micro-batch row is flagged
    ``bloom_hit`` iff a key with its bit pattern was seen in ANY earlier
    batch (or earlier, by doc_id, in the same batch). State is ONE i64
    word per touched block — ≤ 8·n_blocks bytes TOTAL, no matter how
    many documents stream past (contrast streaming_near_dup's
    per-bucket membership lists). The price is bloom semantics: rare
    false positives (route flagged rows to an exact verify against the
    corpus, exactly like the batch operator), never false negatives.

    Bits/blocks are byte-identical to ``bloom_dedup.bloom_terms``, so a
    bloom built by the batch path can seed the stream's state and vice
    versa."""
    from pyspark.sql import functions as F

    from datax_spark.operators.bloom_dedup import bloom_terms

    block, bits = bloom_terms(F.col(key_col), n_blocks)
    keyed = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        block.alias("block"),
        bits.alias("bits"),
    )
    return keyed.groupBy("block").applyInPandasWithState(
        _bloom_fn,
        outputStructType=BLOOM_OUTPUT,
        stateStructType=BLOOM_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
