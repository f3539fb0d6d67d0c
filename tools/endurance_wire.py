"""60-epoch maintained endurance over the PUBLIC wire format.

The third long-horizon driver after the native EpochDriver and the
parquet-tail `run_structured`: the event log is converted to Debezium
envelope JSON-line files (one per epoch, mtime-ordered so the file
source triggers one micro-batch per epoch, oldest first — the same
per-key-LSN-order guarantee a url-key-partitioned Kafka topic gives),
tailed with `run_structured_wire` (readStream.text → parse_debezium →
exactly-once apply_epoch), maintenance ON, with the same worst-window
crash injection as tools/endurance_structured.py: after the table
commit, before the SS batch commit. This is the documented cluster
path minus only the broker — on a cluster the source line becomes
readStream.format("kafka") with everything downstream unchanged.

Checks: final state vs the pure-python fold INCLUDING byte-equal
extracted text (extraction runs on the wire-decoded html), third run
is a no-op, snapshot metadata bounded.

Usage: python tools/endurance_wire.py [n_events] [n_epochs]
Prints one JSON line; record lands in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    crash_epoch = n_epochs // 2

    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    import bench
    from datax_spark.datagen.generator import EventLogSpec, reference_apply
    from datax_spark.functions.extract import extract_text
    from datax_spark.icetable.table import IceTable
    from datax_spark.session import get_spark
    from datax_spark.sources.debezium import to_debezium
    from datax_spark.streaming import driver as drv_mod

    spec = EventLogSpec(
        n_events=n_events,
        n_urls=max(n_events // 5, 100),
        n_domains=50,
        n_epochs=n_epochs,
        evolve_at_epoch=max(n_epochs // 2, 1),
        dirty_per_epoch=0,  # the wire drive measures the envelope path;
        # dirty-envelope quarantine has its own tests (test_debezium)
        seed=42,
    )
    events_dir = bench._cached_event_log(spec)
    spark = get_spark("endurance_wire", shuffle_partitions=32)
    # row payload only — lsn/op ride the envelope (source.lsn, op)
    row_schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("lang", T.StringType()),
            T.StructField("title", T.StringType()),
        ]
    )
    table_schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("title", T.StringType()),
        ]
    )
    work = Path(tempfile.mkdtemp(prefix="datax_endwire_"))
    walls: list[float] = []
    real_apply = drv_mod.apply_epoch
    crashed = {"done": False}

    def instrumented(tbl, batch_df, epoch, **kw):
        t0 = time.monotonic()
        stats = real_apply(tbl, batch_df, epoch, **kw)
        walls.append(time.monotonic() - t0)
        if int(epoch) == crash_epoch and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError(f"injected crash after epoch {epoch}")
        return stats

    drv_mod.apply_epoch = instrumented
    try:
        # epoch parquet shards → one envelope JSON-line file per epoch,
        # mtime-ordered (the log's LSNs are monotone across epochs, so
        # per-key order is preserved exactly as a keyed topic would)
        wire = work / "wire"
        wire.mkdir()
        t0 = time.monotonic()
        shards = sorted(Path(events_dir).glob("events-e*.parquet"))
        for i, shard in enumerate(shards):
            ev = spark.read.option("mergeSchema", "true").parquet(str(shard))
            part_dir = work / f"wirepart{i}"
            to_debezium(ev).coalesce(1).write.text(str(part_dir))
            src = next(part_dir.glob("part-*.txt"))
            dst = wire / f"{i:05d}.txt"
            shutil.copy(src, dst)
            os.utime(dst, (1_700_000_000 + i * 60,) * 2)
            shutil.rmtree(part_dir)
        wire_build = time.monotonic() - t0

        table = IceTable.create(
            spark, work / "t", table_schema, num_partitions=32
        )
        kwargs = dict(max_files_per_partition=16, expire_keep_last=4)
        t0 = time.monotonic()
        try:
            drv_mod.run_structured_wire(
                spark, wire, table, work / "ckpt", row_schema, **kwargs
            )
            raise AssertionError("crash injection never fired")
        except Exception as e:  # noqa: BLE001 - SS wraps the injected error
            if "injected crash" not in str(e):
                raise
        drv_mod.run_structured_wire(
            spark, wire, table, work / "ckpt", row_schema, **kwargs
        )
        wall = time.monotonic() - t0

        events = []
        for s in shards:
            events.extend(pq.read_table(s).to_pylist())
        expected = reference_apply(events)
        got = {r["url"]: r for r in table.read().collect()}
        assert set(got) == set(expected), "key set mismatch"
        for u, row in expected.items():
            assert got[u]["html"] == row["html"], u
        for u in list(expected)[:50]:
            assert got[u]["text"] == extract_text(expected[u]["html"]), u

        v_before = table.current_version()
        drv_mod.run_structured_wire(
            spark, wire, table, work / "ckpt", row_schema, **kwargs
        )
        noop = table.current_version() == v_before
        assert noop, "third invocation committed a snapshot"

        meta_bytes = (
            table.meta_dir / f"v{table.current_version()}.metadata.json"
        ).stat().st_size
        per = sorted(walls[1:])
        print(
            json.dumps(
                {
                    "driver": "run_structured_wire",
                    "wire_format": "debezium-json-lines",
                    "epochs": n_epochs,
                    "events": n_events,
                    "crash_epoch": crash_epoch,
                    "crash_window": "table-committed, SS-uncommitted",
                    "wire_build_sec": round(wire_build, 2),
                    "wall_sec": round(wall, 2),
                    "applies": len(walls),
                    "mean_epoch_sec": round(sum(per) / len(per), 3),
                    "p50_epoch_sec": round(per[len(per) // 2], 3),
                    "p90_epoch_sec": round(per[(len(per) * 9) // 10], 3),
                    "max_epoch_sec": round(per[-1], 3),
                    "snapshot_bytes": meta_bytes,
                    "resume_noop": noop,
                    "state_ok": True,
                }
            )
        )
    finally:
        drv_mod.apply_epoch = real_apply
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
