"""icetable_view_refresh: a materialized rollup table maintained from
the source lake table's pre-image changelog — one job spec, cursor tag
for the sync position, bootstrap through the same maintain path, and
the source is never re-scanned after bootstrap.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from datax_spark.icetable.table import IceTable
from datax_spark.jobspec import run_batch_job
from datax_spark.operators.incremental_view import agg_view
from datax_spark.operators.merge import apply_epoch

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("grp", T.StringType()),
        T.StructField("val", T.LongType()),
    ]
)


def _apply(spark, tbl, epoch, rows):
    ev = spark.createDataFrame(
        rows, "op string, url string, grp string, val long, lsn long"
    )
    apply_epoch(tbl, ev, epoch=epoch, extract=False)


def _spec(src, dst):
    return {
        "reader": {
            "type": "icetable_changes",
            "path": str(src),
            "preImages": True,
            "sinceTag": "view_cursor",
            "advanceTag": "view_cursor",
        },
        "writer": {
            "type": "icetable_view_refresh",
            "path": str(dst),
            "groupCols": ["grp"],
            "sumCols": ["val"],
        },
    }


def _view_state(spark, dst):
    t = IceTable.load(spark, dst)
    return {
        r["grp"]: (r["n_rows"], r["sum_val"], r["nn_val"])
        for r in t.read().collect()
    }


def _expect(src_tbl):
    return {
        r["grp"]: (r["n_rows"], r["sum_val"], r["nn_val"])
        for r in agg_view(src_tbl.read(), ["grp"], ["val"]).collect()
    }


def test_bootstrap_then_incremental(spark, tmp_path):
    src = IceTable.create(spark, tmp_path / "src", SCHEMA, num_partitions=4)
    _apply(
        spark, src, 0,
        [("I", "a", "g1", 10, 1), ("I", "b", "g1", 2, 2), ("I", "c", "g2", 7, 3)],
    )
    spec = _spec(tmp_path / "src", tmp_path / "view")

    run_batch_job(spark, spec)  # bootstrap: no tag yet → full state as I
    assert _view_state(spark, tmp_path / "view") == _expect(src)
    # the tag commit itself bumps the source version; the cursor points
    # at the span the job consumed (everything before the tag commit)
    assert src.resolve_ref("view_cursor") == src.current_version() - 1

    # churn: group move, value change, delete, insert — then incremental
    _apply(
        spark, src, 1,
        [("I", "a", "g2", 40, 4), ("D", "b", None, None, 5), ("I", "d", "g1", None, 6)],
    )
    run_batch_job(spark, spec)
    assert _view_state(spark, tmp_path / "view") == _expect(src)
    # g1 lost a and b, gained null-val d: count 1, sum NULL
    assert _view_state(spark, tmp_path / "view")["g1"] == (1, None, 0)

    # idempotent no-op: cursor is current, feed is empty, view unchanged
    before = _view_state(spark, tmp_path / "view")
    run_batch_job(spark, spec)
    assert _view_state(spark, tmp_path / "view") == before


def test_incremental_does_not_rescan_source(spark, tmp_path, monkeypatch):
    """After bootstrap, a refresh over one churn epoch must read only
    the CHANGED partitions of the source (read_changes' pruning), never
    the full state."""
    src = IceTable.create(spark, tmp_path / "src", SCHEMA, num_partitions=4)
    _apply(
        spark, src, 0,
        [("I", "k%d" % i, "g%d" % (i % 3), i, i + 1) for i in range(16)],
    )
    spec = _spec(tmp_path / "src", tmp_path / "view")
    run_batch_job(spark, spec)

    touched: list[set] = []
    orig = IceTable.read_partitions

    def spy(self, pids, *a, **k):
        if self.root == src.root:
            touched.append(set(pids))
        return orig(self, pids, *a, **k)

    monkeypatch.setattr(IceTable, "read_partitions", spy)
    # one upsert lands in exactly one storage partition
    _apply(spark, src, 1, [("I", "k0", "g9", 999, 100)])
    run_batch_job(spark, spec)
    assert _view_state(spark, tmp_path / "view") == _expect(src)
    assert touched and all(len(s) == 1 for s in touched)


def test_two_op_feed_fails_loudly(spark, tmp_path):
    src = IceTable.create(spark, tmp_path / "src", SCHEMA, num_partitions=2)
    _apply(spark, src, 0, [("I", "a", "g1", 1, 1)])
    _apply(spark, src, 1, [("I", "a", "g1", 2, 2)])  # an update → U row
    spec = _spec(tmp_path / "src", tmp_path / "view")
    spec["reader"].pop("preImages")
    spec["reader"]["fromVersion"] = 1
    spec["reader"].pop("sinceTag")
    spec["reader"].pop("advanceTag")
    with pytest.raises(Exception, match="pre-images"):
        run_batch_job(spark, spec)


def test_multi_group_key_with_nulls(spark, tmp_path):
    """Two group columns, one nullable: the synthetic view key must keep
    (NULL, x) and ('', x) distinct and the maintained rows exact."""
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("g1", T.StringType()),
            T.StructField("g2", T.StringType()),
            T.StructField("val", T.LongType()),
        ]
    )
    src = IceTable.create(spark, tmp_path / "src", schema, num_partitions=2)
    ev = spark.createDataFrame(
        [
            ("I", "a", None, "x", 1, 1),
            ("I", "b", "", "x", 2, 2),
            ("I", "c", "m", "n", 3, 3),
        ],
        "op string, url string, g1 string, g2 string, val long, lsn long",
    )
    apply_epoch(src, ev, epoch=0, extract=False)
    spec = _spec(tmp_path / "src", tmp_path / "view")
    spec["writer"]["groupCols"] = ["g1", "g2"]
    run_batch_job(spark, spec)
    view = IceTable.load(spark, tmp_path / "view").read()
    got = {
        (r["g1"], r["g2"]): (r["n_rows"], r["sum_val"])
        for r in view.collect()
    }
    assert got == {(None, "x"): (1, 1), ("", "x"): (1, 2), ("m", "n"): (1, 3)}
    # and the synthetic keys are unique
    assert view.select("view_key").distinct().count() == 3
