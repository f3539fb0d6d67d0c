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
