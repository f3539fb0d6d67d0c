"""Table maintenance CLI — the operational counterpart of submit_job:

    spark-submit --py-files datax_spark.zip tools/table_tool.py <table_root> <cmd> [args]

Commands:
    history                      snapshot history (one JSON line per version)
    compact [min_files]          fold multi-file partitions (default 2)
    expire [keep_last]           expire old snapshots (default 2)
    orphans [grace_seconds]      remove unreferenced files (default 3600)
    rollback <version>           restore an old snapshot as a new version
    report                       current version + summary JSON
    tag <name> [version]         pin a snapshot under a name (expiry-proof)
    droptag <name>               release a tag
    changes <from> [to] [out]    changelog (CDF) between versions — JSON
                                 lines, or parquet when [out] is given
                                 (a change-event feed another table
                                 ingests: lake-to-lake sync)
    delete <predicate>           DELETE FROM … WHERE: emits D events
                                 through the exactly-once merge (next
                                 snapshot onward; history retained)
    update <col=expr[,…]> <pred> UPDATE … SET … WHERE; assigning a new
                                 column name backfills it table-wide
    files|partitions|snapshots|tags
                                 metadata tables (Iceberg's .files /
                                 .partitions / .snapshots / refs) as
                                 JSON lines — file sizes, per-partition
                                 delete-debt, per-version operations
    rename <old> <new>           rename a column (metadata-only; reads
                                 coalesce through the name mapping)
    dropcol <name>               drop a column (metadata-only; time
                                 travel keeps it; re-add refused)
    purge <key> [key …]          right-to-be-forgotten: hard-delete the
                                 keys from EVERY retained snapshot,
                                 delete files and quarantine included
    clone <target_root>          zero-copy clone (hard links): full
                                 history/tags/ledger, independent lives
    health                       per-epoch pipeline report from lineage;
                                 exit 1 + anomaly JSON on stderr when
                                 something needs paging
    syncindex <kind> <idx_root>  advance a CDC-maintained index
                                 (bm25|trigram|ivf|minhash) from this
                                 table's changelog since its cursor
    register <kind> <root>       record a derived artifact in table
                                 properties (purge + syncall reach it)
    syncall                      advance every registered index
                                 artifact from the changelog
    syncjoinview <view> <other>  advance the materialized join view at
                                 <view>; this table and <other> are the
                                 two sides

Every command prints machine-readable JSON on stdout; exit 0 on success.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv: list[str]) -> int:
    if len(argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    root, cmd, args = argv[1], argv[2], argv[3:]
    from pyspark.sql import SparkSession

    from datax_spark.icetable.table import IceTable

    spark = SparkSession.builder.getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    table = IceTable.load(spark, root)
    if cmd == "history":
        for h in table.history():
            print(json.dumps(h, sort_keys=True, default=str))
    elif cmd == "compact":
        pids = table.compact(min_files=int(args[0]) if args else 2)
        print(json.dumps({"compacted_partitions": pids, "version": table.current_version()}))
    elif cmd == "expire":
        deleted = table.expire_snapshots(keep_last=int(args[0]) if args else 2)
        print(json.dumps({"deleted_files": len(deleted), "version": table.current_version()}))
    elif cmd == "orphans":
        removed = table.remove_orphans(grace_seconds=float(args[0]) if args else 3600.0)
        print(json.dumps({"removed": removed}))
    elif cmd == "rollback":
        v = table.rollback(int(args[0]))
        print(json.dumps({"version": v, "restored": int(args[0])}))
    elif cmd == "changes":
        from_v = int(args[0])
        to_v = int(args[1]) if len(args) > 1 and args[1] != "-" else None
        # both output modes emit the SAME change-event schema (op/lsn):
        # the stdout JSON lines are as ingestible as the parquet feed
        feed = table.read_changes(from_v, to_v).withColumnRenamed(
            "_op", "op"
        ).withColumnRenamed("_lsn", "lsn")
        if len(args) > 2:
            feed.write.mode("overwrite").parquet(args[2])
            print(json.dumps({"rows": table.spark.read.parquet(args[2]).count(),
                              "out": args[2]}))
        else:
            for r in feed.toLocalIterator():
                print(json.dumps(r.asDict(), sort_keys=True, default=str))
    elif cmd == "tag":
        v = table.tag(args[0], int(args[1]) if len(args) > 1 else None)
        print(json.dumps({"tag": args[0], "version": v, "refs": table.refs()}))
    elif cmd == "droptag":
        table.drop_tag(args[0])
        print(json.dumps({"dropped": args[0], "refs": table.refs()}))
    elif cmd == "delete":
        from datax_spark.operators.rowlevel import delete_where

        stats = delete_where(table, args[0])
        print(json.dumps({"deleted": stats.rows_in, "skipped": stats.skipped,
                          "version": table.current_version()}))
    elif cmd == "update":
        from datax_spark.operators.rowlevel import update_where

        sets = dict(kv.split("=", 1) for kv in args[0].split(","))
        stats = update_where(table, sets, args[1] if len(args) > 1 else "true")
        print(json.dumps({"updated": stats.rows_in, "skipped": stats.skipped,
                          "version": table.current_version()}))
    elif cmd in ("files", "partitions", "snapshots", "tags"):
        from datax_spark.icetable import meta_tables as M

        fn = {"files": M.files, "partitions": M.partitions,
              "snapshots": M.snapshots, "tags": M.refs}[cmd]
        for r in fn(table).toLocalIterator():
            print(json.dumps(r.asDict(), sort_keys=True, default=str))
    elif cmd == "rename":
        v = table.rename_column(args[0], args[1])
        print(json.dumps({"renamed": [args[0], args[1]], "version": v,
                          "name_mapping": table.name_mapping()}))
    elif cmd == "dropcol":
        v = table.drop_column(args[0])
        print(json.dumps({"dropped": args[0], "version": v}))
    elif cmd == "purge":
        # hard-delete from RETAINED HISTORY too (vs `delete`, which only
        # removes from the next snapshot): the erasure-request command.
        # Registered derived artifacts (indexes, views) are purged in
        # the same run — partial erasure is a compliance failure, so
        # reaching everything is the default, not an option.
        from datax_spark.operators.derived import purge_everywhere, registered

        if registered(table):
            res = purge_everywhere(spark, table, args)
        else:
            res = table.purge_keys(args)
        print(json.dumps(res, sort_keys=True))
    elif cmd == "register":
        # record a derived artifact: register <kind> <root>
        from datax_spark.operators.derived import register, registered

        register(table, args[0], args[1])
        print(json.dumps(registered(table)))
    elif cmd == "syncall":
        from datax_spark.operators.derived import sync_all

        print(json.dumps(sync_all(spark, table), sort_keys=True))
    elif cmd == "clone":
        cloned = table.clone(args[0])
        print(json.dumps({"target": args[0], "version": cloned.current_version()}))
    elif cmd == "health":
        from datax_spark.operators.ops_report import (
            pipeline_report,
            report_anomalies,
        )

        rep = pipeline_report(table)
        anomalies = [r.asDict() for r in report_anomalies(rep).collect()]
        for r in rep.toLocalIterator():
            print(json.dumps(r.asDict(), sort_keys=True, default=str))
        print(json.dumps({"anomalies": anomalies}, sort_keys=True, default=str),
              file=sys.stderr)
        return 0 if not anomalies else 1
    elif cmd == "syncindex":
        # advance a CDC-maintained index artifact (bm25|trigram|ivf|
        # minhash) from this table's changelog since its stored cursor
        kind, idx_root = args[0], args[1]
        if kind == "bm25":
            from datax_spark.operators.text_index import Bm25Index

            out = Bm25Index(spark, idx_root).sync(table)
        elif kind == "trigram":
            from datax_spark.operators.trigram_index import TrigramIndex

            out = TrigramIndex(spark, idx_root).sync(table)
        elif kind == "ivf":
            from datax_spark.operators.ann_index import IvfIndex

            out = IvfIndex(spark, idx_root).sync(table)
        elif kind == "minhash":
            from datax_spark.operators.dedup_index import MinHashIndex

            pairs = MinHashIndex.load(spark, idx_root).sync(table)
            out = {"new_pairs": pairs.count()}
        else:
            print(f"unknown index kind {kind!r} "
                  f"(bm25|trigram|ivf|minhash)", file=sys.stderr)
            return 2
        print(json.dumps(out, sort_keys=True))
    elif cmd == "syncjoinview":
        # advance the materialized join view <view_root> whose OTHER
        # side is <other_root>; this table is side A or B — order-free
        from datax_spark.operators.incremental_view import sync_join_view

        view = IceTable.load(spark, args[0])
        other = IceTable.load(spark, args[1])
        out = sync_join_view(view, table, other)
        print(json.dumps(out, sort_keys=True))
    elif cmd == "report":
        meta = table.metadata()
        print(json.dumps(
            {"version": meta["version"], "summary": meta["summary"],
             "partitions": meta["partition_spec"]["num_partitions"],
             "live_files": len(table.manifest_entries()),
             "delete_files": len(table.delete_entries())},
            sort_keys=True,
        ))
    else:
        print(f"unknown command {cmd!r}", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
