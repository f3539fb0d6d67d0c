"""AQE skew-join evidence: a pathologically skewed join key must be
split by OptimizeSkewedJoin at runtime — the no-code-change half of the
engine's skew story (the deterministic salting in operators/merge.py
is the explicit half, used where AQE can't see the skew: window LWW)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_partition(spark):
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # 150k rows on ONE key vs 64 spread keys; payload pads bytes
        left = spark.range(0, 160_000).select(
            F.when(F.col("id") < 150_000, 0)
            .otherwise(F.col("id") % 64)
            .alias("k"),
            F.concat(F.lit("p" * 64), F.col("id")).alias("pay"),
        )
        right = spark.range(0, 64).select(
            F.col("id").alias("k"), F.lit("dim").alias("d")
        )
        j = left.join(right, "k")
        # materialize THIS QueryExecution (count() would plan its own):
        # AQE finalizes a plan only for the execution that ran it
        assert len(j.collect()) == 160_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
