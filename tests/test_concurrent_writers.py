"""Multi-writer optimistic concurrency: a pure append that loses the
CAS race rebuilds its manifest deltas against the new snapshot and
lands; rewrite-bearing commits still surface TableCommitConflict.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import types as T

from datax_spark.icetable.table import IceTable, TableCommitConflict

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("val", T.LongType()),
    ]
)


def _mk(spark, tmp_path, P=4):
    return IceTable.create(spark, tmp_path / "t", SCHEMA, num_partitions=P)


def _df(spark, rows):
    return spark.createDataFrame(
        [(u, v, p, l) for (u, v, p, l) in rows],
        "url string, val long, _pid int, _lsn long",
    )


def test_append_retry_survives_lost_cas(spark, tmp_path, monkeypatch):
    """Deterministic lost race: a rival commit lands between writer B's
    metadata read and its publish. B's first attempt must CAS-fail;
    the retry rebuilds against the rival's snapshot and lands. Nothing
    is lost: both writers' rows and all three versions exist."""
    t = _mk(spark, tmp_path)
    f0 = t.stage_data_files(_df(spark, [("a", 1, 0, 1)]), epoch=0)
    t.commit(0, {0}, f0)

    rival = IceTable.load(spark, tmp_path / "t")
    fB = t.stage_data_files(_df(spark, [("b", 2, 1, 2)]), epoch=2)
    real_publish = t._publish
    fired = []

    def racing_publish(meta):
        if not fired:
            fired.append(True)
            # rival publishes between B's metadata read and B's publish
            # → B's publish of the same next version must lose the CAS
            fR = rival.stage_data_files(_df(spark, [("c", 3, 2, 3)]), epoch=1)
            rival.commit(1, {2}, fR)
        real_publish(meta)

    monkeypatch.setattr(t, "_publish", racing_publish)
    v = t.commit_append_with_retry(2, {1}, fB)
    assert v == 3  # v1 = initial, v2 = rival, v3 = retried append
    got = {r["url"]: r["val"] for r in t.read().collect()}
    assert got == {"a": 1, "b": 2, "c": 3}
    assert t.is_committed(1, 2) and t.is_committed(2, 1)


def test_append_retry_exhaustion_raises(spark, tmp_path, monkeypatch):
    t = _mk(spark, tmp_path)
    fA = t.stage_data_files(_df(spark, [("a", 1, 0, 1)]), epoch=0)

    rival = IceTable.load(spark, tmp_path / "t")
    real_publish = t._publish
    n = [0]

    def always_racing(meta):
        fR = rival.stage_data_files(
            _df(spark, [(f"r{n[0]}", n[0], 1, 10 + n[0])]), epoch=100 + n[0]
        )
        rival.commit(100 + n[0], {1}, fR)
        n[0] += 1
        real_publish(meta)

    monkeypatch.setattr(t, "_publish", always_racing)
    try:
        t.commit_append_with_retry(0, {0}, fA, max_retries=2)
        raise AssertionError("expected TableCommitConflict")
    except TableCommitConflict as e:
        assert "after 2 retries" in str(e)


def test_parallel_appenders_all_land(spark, tmp_path):
    """Four writers on four handles appending disjoint keys/partitions
    concurrently — with retry, every append lands exactly once
    regardless of interleaving."""
    t = _mk(spark, tmp_path)

    def write(i: int) -> int:
        h = IceTable.load(spark, tmp_path / "t")
        f = h.stage_data_files(
            _df(spark, [(f"k{i}", i, i % 4, i + 1)]), epoch=i
        )
        return h.commit_append_with_retry(i, {i % 4}, f)

    with ThreadPoolExecutor(max_workers=4) as ex:
        versions = list(ex.map(write, range(4)))
    assert sorted(versions) == [1, 2, 3, 4]
    got = {r["url"]: r["val"] for r in t.read().collect()}
    assert got == {f"k{i}": i for i in range(4)}
