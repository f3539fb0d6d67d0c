"""Endurance + fixed-cost measurement for the CDC loop.

Two questions the 10^10-event design point hinges on:

1. **Per-epoch fixed cost** — the driver-side work (stat collects,
   manifest/commit IO, bloom build, scheduling) that does NOT scale with
   batch size. Measured by running the same total event count at two
   epoch granularities and solving the 2×2 system:
   ``wall(epoch) = fixed + marginal × batch``.
2. **Many-epoch behavior** — ledger watermark fold, scheduled
   maintenance, and metadata growth across hundreds of epochs, with a
   final state check against the pure-python fold.

Usage: python tools/endurance.py [n_events] [epochs_small] [epochs_large]
Prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def run(n_events: int, n_epochs: int, maintain: bool) -> dict:
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    import bench
    from datax_spark.datagen.generator import (
        EventLogSpec,
        reference_apply,
    )
    from datax_spark.functions.extract import extract_text
    from datax_spark.icetable.table import IceTable
    from datax_spark.session import get_spark
    from datax_spark.streaming.driver import EpochDriver
    from datax_spark.streaming.source import ChangeTailSource

    spec = EventLogSpec(
        n_events=n_events,
        n_urls=max(n_events // 5, 100),
        n_domains=50,
        n_epochs=n_epochs,
        evolve_at_epoch=max(n_epochs // 2, 1),
        dirty_per_epoch=2,
        seed=42,
    )
    events_dir = bench._cached_event_log(spec)
    spark = get_spark("endurance", shuffle_partitions=32)
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    work = Path(tempfile.mkdtemp(prefix=f"datax_endur{n_epochs}_"))
    try:
        table = IceTable.create(spark, work / "t", schema, num_partitions=32)
        # production maintenance shape (BENCH/BASELINE.md "Endurance"):
        # staggered per-partition file-count compaction + per-epoch
        # snapshot expiry — bounds per-epoch wall AND disk at any epoch
        # count. compact-every-K measured worse tail latency (sweeps).
        maintenance = (
            dict(max_files_per_partition=16, expire_keep_last=4)
            if maintain
            else {}
        )
        drv = EpochDriver(
            spark,
            ChangeTailSource(spark, events_dir),
            table,
            work / "ckpt",
            **maintenance,
        )
        t0 = time.monotonic()
        stats = drv.run()
        wall = time.monotonic() - t0
        # exclude epoch 0 (JVM/codegen warmup) from the per-epoch figure
        per_epoch = sorted(s.wall_ms / 1000 for s in stats[1:])
        meta = table.metadata()
        meta_bytes = (table.meta_dir / f"v{table.current_version()}.metadata.json").stat().st_size

        # final-state check vs the sequential pure fold (incl. text bytes
        # on a sample)
        events = []
        for s in sorted(Path(events_dir).glob("events-e*.parquet")):
            events.extend(pq.read_table(s).to_pylist())
        expected = reference_apply(events)
        got = {r["url"]: r for r in table.read().collect()}
        assert set(got) == set(expected), "key set mismatch"
        sample = list(expected)[:50]
        for u in sample:
            assert got[u]["html"] == expected[u]["html"], u
            assert got[u]["text"] == extract_text(expected[u]["html"]), u
        return {
            "epochs": n_epochs,
            "events": n_events,
            "batch": n_events // n_epochs,
            "wall_sec": round(wall, 2),
            "mean_epoch_sec": round(sum(per_epoch) / len(per_epoch), 3),
            # min ≈ the clean-table (just-compacted) epoch cost: the true
            # per-epoch fixed floor; max-vs-min is the file-debt growth
            # that scheduled compaction bounds
            "min_epoch_sec": round(per_epoch[0], 3),
            "p50_epoch_sec": round(per_epoch[len(per_epoch) // 2], 3),
            "p90_epoch_sec": round(per_epoch[(len(per_epoch) * 9) // 10], 3),
            "max_epoch_sec": round(per_epoch[-1], 3),
            # chronological, epoch 0 (warmup) included — lets a reader
            # see WHERE tail epochs cluster, not just that they exist
            "epoch_durations_sec": [round(s.wall_ms / 1000, 2) for s in stats],
            "ledger_exact_entries": len(meta["commits"]),
            "ledger_watermark": meta.get("commit_epoch_watermark", -1),
            "snapshot_bytes": meta_bytes,
            "merge_modes": sorted({s.merge_mode for s in stats if s.merge_mode}),
            "state_ok": True,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    e_small = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    e_large = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    coarse = run(n, e_small, maintain=False)
    fine = run(n, e_large, maintain=True)
    # wall(epoch) = fixed + marginal*batch. The fine run's epochs are not
    # constant-cost (live-file debt grows until compaction folds it), so a
    # two-point solve on the MEANS misattributes the debt to the batch
    # term; use the fine run's minimum — the clean-table, just-compacted
    # epoch — as the fixed floor, and derive the marginal from the coarse
    # run above it.
    fixed = fine["min_epoch_sec"]
    marginal = max(coarse["mean_epoch_sec"] - fixed, 0.0) / coarse["batch"]
    print(
        json.dumps(
            {
                "coarse": coarse,
                "fine": fine,
                "fixed_cost_sec_per_epoch": round(fixed, 3),
                "marginal_usec_per_event": round(marginal * 1e6, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
