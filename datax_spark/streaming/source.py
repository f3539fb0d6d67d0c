"""Change-event tail source — DataX Reader plugins reimagined as a
replayable Structured-Streaming-style source (SURVEY.md §2.1 S11).

The tail is an append-only directory of parquet shards
(``events-e*.parquet``, FIXTURES.md F2). Offsets are shard indices in
lexicographic order — stable, monotone, replayable. An offset range
``(start, end]`` identifies an exact byte-identical batch forever, which
is what makes checkpoint replay meaningful.

Reads use ``mergeSchema`` so a shard that introduces a new column
mid-stream (additive schema evolution) surfaces it in the batch schema —
the MERGE sink reconciles from there (ST4).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class ChangeTailSource:
    def __init__(self, spark: SparkSession, events_dir: str | Path, pattern: str = "events-e*.parquet"):
        self.spark = spark
        self.events_dir = Path(events_dir)
        self.pattern = pattern

    def latest_offset(self) -> int:
        """Number of shards currently in the log (end offset)."""
        return len(self._shards())

    def _shards(self) -> list[Path]:
        return sorted(self.events_dir.glob(self.pattern))

    def read_range(self, start: int, end: int) -> DataFrame:
        """Batch for offset range (start, end] — shards [start, end)."""
        shards = self._shards()[start:end]
        if not shards:
            raise ValueError(f"empty offset range ({start}, {end}]")
        return (
            self.spark.read.option("mergeSchema", "true")
            .parquet(*[str(s) for s in shards])
        )
