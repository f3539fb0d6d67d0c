"""60+-epoch maintained endurance through the REAL Structured Streaming
twin (readStream + foreachBatch), with a crash injected mid-drive.

Every long-horizon drive so far (60/150/400 epochs) ran the native
EpochDriver; this one promotes ``run_structured`` to the same evidence
bar. The crash is injected in the WORST window: after ``apply_epoch``
has committed the batch to the table but before Structured Streaming
records the batch commit — on restart SS re-delivers that batch under
the SAME batch id (documented foreachBatch retry semantics) and the
table's idempotence ledger must fold it to a no-op. Injection wraps
``apply_epoch`` at the tool level (the product path runs verbatim; the
wrapper only adds the raise + per-epoch wall capture).

Checks: final state vs the pure-python fold (html byte-equal on every
key, extracted text byte-equal on a sample), a third invocation is a
no-op (no new snapshot version), snapshot metadata stays bounded.

Usage: python tools/endurance_structured.py [n_events] [n_epochs]
Prints one JSON line; the record lands in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    crash_epoch = n_epochs // 2

    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    import bench
    from datax_spark.datagen.generator import EventLogSpec, reference_apply
    from datax_spark.functions.extract import extract_text
    from datax_spark.icetable.table import IceTable
    from datax_spark.session import get_spark
    from datax_spark.streaming import driver as drv_mod

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
    spark = get_spark("endurance_structured", shuffle_partitions=32)
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            # file source fixes the schema up front: pre-evolution
            # shards read the evolved column as null (see
            # run_structured docstring)
            T.StructField("title", T.StringType()),
        ]
    )
    work = Path(tempfile.mkdtemp(prefix="datax_endss_"))
    walls: list[float] = []
    real_apply = drv_mod.apply_epoch
    crashed = {"done": False}

    def instrumented(table, batch_df, epoch, **kw):
        t0 = time.monotonic()
        stats = real_apply(table, batch_df, epoch, **kw)
        walls.append(time.monotonic() - t0)
        if int(epoch) == crash_epoch and not crashed["done"]:
            crashed["done"] = True
            # table commit has landed; SS batch commit has NOT
            raise RuntimeError(f"injected crash after epoch {epoch}")
        return stats

    drv_mod.apply_epoch = instrumented
    try:
        table = IceTable.create(spark, work / "t", schema, num_partitions=32)
        kwargs = dict(
            max_files_per_partition=16,
            expire_keep_last=4,
        )
        t0 = time.monotonic()
        try:
            drv_mod.run_structured(
                spark, events_dir, table, work / "ckpt", **kwargs
            )
            raise AssertionError("crash injection never fired")
        except Exception as e:  # noqa: BLE001 - SS wraps the injected error
            if "injected crash" not in str(e):
                raise
        # resume: SS re-delivers the crashed batch under the same id;
        # the ledger folds it to a no-op, then the tail drains
        drv_mod.run_structured(
            spark, events_dir, table, work / "ckpt", **kwargs
        )
        wall = time.monotonic() - t0

        events = []
        for s in sorted(Path(events_dir).glob("events-e*.parquet")):
            events.extend(pq.read_table(s).to_pylist())
        expected = reference_apply(events)
        got = {r["url"]: r for r in table.read().collect()}
        assert set(got) == set(expected), "key set mismatch"
        for u, row in expected.items():
            assert got[u]["html"] == row["html"], u
        for u in list(expected)[:50]:
            assert got[u]["text"] == extract_text(expected[u]["html"]), u

        v_before = table.current_version()
        drv_mod.run_structured(
            spark, events_dir, table, work / "ckpt", **kwargs
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
                    "driver": "run_structured",
                    "epochs": n_epochs,
                    "events": n_events,
                    "crash_epoch": crash_epoch,
                    "crash_window": "table-committed, SS-uncommitted",
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
