"""Change-event tail source — DataX Reader plugins reimagined as a
replayable Structured-Streaming-style source (SURVEY.md §2.1 S11).

The tail is an append-only directory of parquet shards
(``events-e*.parquet``, FIXTURES.md F2). Two offset granularities, both
stable, monotone and replayable — an offset range ``(start, end]``
identifies an exact byte-identical batch forever:

* **shard offsets** (default): shard indices in lexicographic order —
  Spark's own ``maxFilesPerTrigger`` granularity.
* **row offsets** (DataX ``speed.record`` rate limiting, ST5): global
  row positions across the shard sequence. Whole shards inside a range
  read through the normal distributed parquet scan; the at-most-two
  boundary shards are sliced row-group-accurately via pyarrow into
  deterministic spill files that Spark then scans like any shard — the
  driver never materializes rows, and a slice is bounded by the epoch's
  record budget. On a cluster this boundary path would be a row-group-
  aligned DataSource-V2 scan; the offset semantics are identical.

Reads use ``mergeSchema`` so a shard that introduces a new column
mid-stream (additive schema evolution) surfaces it in the batch schema —
the MERGE sink reconciles from there (ST4).
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession


class ChangeTailSource:
    def __init__(self, spark: SparkSession, events_dir: str | Path, pattern: str = "events-e*.parquet"):
        self.spark = spark
        self.events_dir = Path(events_dir)
        self.pattern = pattern
        self._row_counts: dict[str, int] = {}  # shards are immutable

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

    def shard_byte_sizes(self) -> list[int]:
        """On-disk bytes per shard (one stat each; shards are immutable
        so sizes never change once seen). Basis for the DataX
        ``speed.byte`` analogue: byte-bounded epoch sizing."""
        return [s.stat().st_size for s in self._shards()]

    # ---------------- row-granular offsets (ST5 record limit) ---------- #
    def shard_row_counts(self) -> list[int]:
        """Rows per shard, from parquet footers only (no data pages)."""
        out = []
        for s in self._shards():
            key = str(s)
            n = self._row_counts.get(key)
            if n is None:
                n = pq.read_metadata(s).num_rows
                self._row_counts[key] = n
            out.append(n)
        return out

    def latest_row_offset(self) -> int:
        return sum(self.shard_row_counts())

    def _slice_shard(self, shard: Path, lo: int, hi: int, slice_dir: Path) -> Path:
        """Materialize rows [lo, hi) of one shard as a deterministic
        spill file (row-group-pruned read; idempotent by name, atomic
        publish) so Spark scans it exactly like a full shard."""
        dest = slice_dir / f"{shard.stem}-r{lo:09d}-{hi:09d}.parquet"
        if dest.exists():
            return dest  # replay: identical bytes by construction
        slice_dir.mkdir(parents=True, exist_ok=True)
        pf = pq.ParquetFile(shard)
        parts = []
        base = 0
        for g in range(pf.num_row_groups):
            n = pf.metadata.row_group(g).num_rows
            if base + n > lo and base < hi:
                t = pf.read_row_group(g)
                a, b = max(lo - base, 0), min(hi - base, n)
                parts.append(t.slice(a, b - a))
            base += n
        tmp = dest.with_suffix(f".tmp-{lo}")
        pq.write_table(pa.concat_tables(parts), tmp, row_group_size=8192)
        tmp.replace(dest)
        return dest

    def read_row_range(self, start: int, end: int, slice_dir: str | Path) -> DataFrame:
        """Batch for global row range [start, end): whole shards scan
        distributed; boundary partial shards go through _slice_shard."""
        if end <= start:
            raise ValueError(f"empty row range [{start}, {end})")
        paths: list[str] = []
        base = 0
        for shard, n in zip(self._shards(), self.shard_row_counts()):
            lo, hi = max(start - base, 0), min(end - base, n)
            if lo < hi:
                if lo == 0 and hi == n:
                    paths.append(str(shard))
                else:
                    paths.append(str(self._slice_shard(shard, lo, hi, Path(slice_dir))))
            base += n
            if base >= end:
                break
        return self.spark.read.option("mergeSchema", "true").parquet(*paths)
