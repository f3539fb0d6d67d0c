"""CLI job runner — the north rule's deployment path made concrete:

    zip -r datax_spark.zip datax_spark
    spark-submit --master <cluster> --py-files datax_spark.zip \
        tools/submit_job.py job.json

``job.json`` is a DataX-style job spec (datax_spark/jobspec.py): a batch
spec (file/jdbc reader → transforms → writer) runs through
``run_batch_job``; a CDC spec (``reader.type=change_tail`` +
``writer.type=icetable``) runs the checkpointed epoch loop through
``run_cdc_job`` and prints per-epoch stats. The icetable writer's
``schema`` field may be a DDL string ("url string, ..." ) for CLI use.

Exit code 0 on success; non-zero with the error on stderr (an exceeded
error budget aborts the job, DataX semantics).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv: list[str]) -> int:
    args = list(argv[1:])
    dry_run = "--dry-run" in args
    if dry_run:
        args.remove("--dry-run")
    if len(args) != 1:
        print(__doc__, file=sys.stderr)
        return 2
    spec = json.loads(Path(args[0]).read_text())
    if dry_run:
        # cluster CDC specs validate + print their compiled artifacts
        # (stream options, catalog confs, MERGE SQL) without a
        # SparkSession, broker, or jars — the first thing to run on a
        # new cluster (README "on a real cluster")
        if (spec.get("writer") or {}).get("type") != "iceberg":
            print("--dry-run supports cluster CDC specs "
                  "(writer.type=iceberg)", file=sys.stderr)
            return 2
        from datax_spark.cluster import dry_run_cluster_cdc_job

        print(json.dumps(dry_run_cluster_cdc_job(spec), indent=2))
        return 0
    from pyspark.sql import SparkSession, types as T

    from datax_spark.jobspec import run_batch_job, run_cdc_job

    spark = SparkSession.builder.getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from datax_spark.compat import is_datax_job, run_datax_job

    if is_datax_job(spec):
        # a stock DataX {"job": {...}} config runs unchanged
        # (datax_spark/compat.py translates plugin names → jobspecs)
        run_datax_job(spark, spec)
        return 0
    writer = spec.get("writer") or {}
    if writer.get("type") == "iceberg":
        # real-cluster endpoints (needs spark-sql-kafka +
        # iceberg-spark-runtime on the classpath; datax_spark/cluster.py)
        from datax_spark.cluster import run_cluster_cdc_job

        schema = T.StructType.fromDDL(spec["reader"]["eventSchema"])
        run_cluster_cdc_job(spark, spec, schema)
        return 0
    if writer.get("type") == "icetable":
        if isinstance(writer.get("schema"), str):
            writer["schema"] = T.StructType.fromDDL(writer["schema"])
        driver = run_cdc_job(spark, spec)
        for e in driver.recorded_epochs():
            start, end = driver.offset_range(e)
            print(f"epoch={e} offsets=({start},{end}] unit={driver.offset_unit(e)}")
        print(
            "table_version=%d total_rows=%d"
            % (
                driver.table.current_version(),
                driver.table.metadata()["summary"]["total_rows"],
            )
        )
        # DataX-style end-of-job statistics (speed, records, dirty%)
        print("report=" + json.dumps(driver.report(), sort_keys=True))
    else:
        df = run_batch_job(spark, spec)
        print(f"rows={df.count()}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
