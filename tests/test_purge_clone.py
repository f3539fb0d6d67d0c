"""Compliance purge (right-to-be-forgotten across retained history) and
zero-copy clone — IceTable.purge_keys / IceTable.clone.

purge_keys is the one legitimate history rewrite: the purged key must
vanish from EVERY retained snapshot (time travel, tags, equality-delete
files, quarantine) while version numbers, the commit ledger, schema
history and every other row stay bit-for-bit. clone shares immutable
data bytes via hard links, so either side's maintenance (expiry
included) can never dangle the other.
"""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import types as T

from datax_spark.icetable.table import IceTable
from datax_spark.operators.merge import apply_epoch

PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)
EV = "lsn long, op string, url string, warc_ts timestamp, html binary, lang string"
TS = dt.datetime(2026, 1, 1)
TARGET = "https://d1.example.com/7"


def _batch(spark, rows):
    return spark.createDataFrame(
        [
            (lsn, op, url, TS, html, "en")
            for lsn, op, url, html in rows
        ],
        EV,
    )


def _build(spark, path, P=4):
    """3 data versions: v1 inserts 12 urls (TARGET included), v2 updates
    TARGET + one other, v3 deletes an unrelated url."""
    t = IceTable.create(spark, path, PAGE_SCHEMA, num_partitions=P)
    apply_epoch(
        t,
        _batch(
            spark,
            [
                (i + 1, "I", f"https://d{i % 3}.example.com/{i}", f"<p>page {i}</p>".encode())
                for i in range(12)
            ]
            + [(13, "I", TARGET, b"<p>secret profile</p>")],
        ),
        0,
    )
    apply_epoch(
        t,
        _batch(
            spark,
            [
                (20, "U", TARGET, b"<p>updated secret</p>"),
                (21, "U", "https://d0.example.com/0", b"<p>page 0 v2</p>"),
            ],
        ),
        1,
    )
    apply_epoch(t, _batch(spark, [(30, "D", "https://d2.example.com/2", None)]), 2)
    return t


def _state(t, v):
    return {
        r["url"]: (r["text"], r["lang"]) for r in t.read(version=v).collect()
    }


def test_purge_removes_key_from_every_retained_version(spark, tmp_path):
    t = _build(spark, tmp_path / "t")
    versions = range(1, t.current_version() + 1)
    before = {v: _state(t, v) for v in versions}
    assert any(TARGET in s for s in before.values())
    epochs_before = t.committed_epochs()

    res = t.purge_keys([TARGET, "https://never.example.com/x"])

    assert res["rows_purged"] >= 1
    assert res["files_rewritten"] + res["files_dropped"] >= 1
    for v in versions:
        after = _state(t, v)
        assert TARGET not in after
        expect = {k: x for k, x in before[v].items() if k != TARGET}
        assert after == expect, f"non-purged rows drifted at v{v}"
    # ledger, history, current state all intact
    assert t.committed_epochs() == epochs_before
    assert t.current_version() == res["audit_version"]
    audit = t.metadata()["summary"]["purge"]
    assert audit["keys_purged"] == 2 and audit["rows_purged"] == res["rows_purged"]


def test_purge_missing_key_is_a_noop(spark, tmp_path):
    t = _build(spark, tmp_path / "t")
    v = t.current_version()
    res = t.purge_keys(["https://never.example.com/x"])
    assert res["rows_purged"] == 0
    assert res["files_rewritten"] == 0 and res["files_dropped"] == 0
    assert res["versions_touched"] == []
    assert t.current_version() == v + 1  # audit snapshot still records the run


def test_purge_scrubs_equality_delete_files(spark, tmp_path):
    """A MoR epoch leaves TARGET's key string inside an equality-delete
    file; the purge must scrub that copy too."""
    t = IceTable.create(spark, tmp_path / "t", PAGE_SCHEMA, num_partitions=4)
    apply_epoch(
        t,
        _batch(
            spark,
            [(i + 1, "I", f"https://d{i % 3}.example.com/{i}", b"<p>x</p>") for i in range(40)]
            + [(41, "I", TARGET, b"<p>secret</p>")],
        ),
        0,
    )
    apply_epoch(
        t,
        _batch(spark, [(50, "U", TARGET, b"<p>secret v2</p>")]),
        1,
        merge_strategy="mor",
    )
    assert t.delete_entries(), "test premise: MoR epoch produced delete files"
    res = t.purge_keys([TARGET])
    assert res["delete_files_rewritten"] + res["files_dropped"] >= 1
    for d in t.delete_entries():
        keys = {
            r["url"]
            for r in spark.read.parquet(str(t.root / d["path"])).collect()
        }
        assert TARGET not in keys
    for v in range(1, t.current_version() + 1):
        assert TARGET not in _state(t, v)


def test_purge_scrubs_quarantine(spark, tmp_path):
    t = _build(spark, tmp_path / "t")
    dirty = spark.createDataFrame(
        [(None, "I", TARGET, TS, b"<p>bad</p>", "en"),
         (None, "I", "https://ok.example.com/1", TS, b"<p>ok</p>", "en")],
        EV,
    )
    t.write_quarantine(dirty, epoch=9)
    res = t.purge_keys([TARGET])
    assert res["quarantine_rows_purged"] == 1
    q = t.read_quarantine()
    urls = {r["url"] for r in q.collect()}
    assert TARGET not in urls and "https://ok.example.com/1" in urls


def test_purge_silences_changelog(spark, tmp_path):
    t = _build(spark, tmp_path / "t")
    assert any(
        r["url"] == TARGET for r in t.read_changes(1, 2).collect()
    ), "test premise: TARGET churned between v1 and v2"
    t.purge_keys([TARGET])
    for a in range(1, t.current_version()):
        for b in range(a + 1, t.current_version() + 1):
            assert all(
                r["url"] != TARGET for r in t.read_changes(a, b).collect()
            )


def test_purge_leaves_no_trace_in_metadata(spark, tmp_path):
    t = _build(spark, tmp_path / "t")
    t.purge_keys([TARGET])
    for p in t.meta_dir.rglob("*.json"):
        assert TARGET not in p.read_text(), p


def test_clone_is_equal_and_independent(spark, tmp_path):
    src = _build(spark, tmp_path / "src")
    clone = src.clone(tmp_path / "dst")

    assert clone.current_version() == src.current_version()
    assert clone.committed_epochs() == src.committed_epochs()
    for v in range(1, src.current_version() + 1):
        assert _state(clone, v) == _state(src, v)
    # zero-copy: shared data files are hard links, not copies
    f = src.manifest_entries()[0]
    assert (src.root / f["path"]).stat().st_nlink >= 2

    # divergence: a commit on the clone is invisible to the source
    v_src = src.current_version()
    apply_epoch(clone, _batch(spark, [(99, "I", "https://clone.only/1", b"<p>c</p>")]), 50)
    assert src.current_version() == v_src
    assert "https://clone.only/1" not in _state(src, v_src)
    assert "https://clone.only/1" in _state(clone, clone.current_version())

    # source-side maintenance cannot dangle the clone: expire every old
    # source snapshot, clone still reads its full history
    src.expire_snapshots(keep_last=1)
    for v in range(1, v_src + 1):
        clone.read(version=v).count()  # must not raise / lose files


def test_clone_refuses_existing_target(spark, tmp_path):
    src = _build(spark, tmp_path / "src")
    src.clone(tmp_path / "dst")
    with pytest.raises(FileExistsError):
        src.clone(tmp_path / "dst")


def test_clone_metadata_is_rewritten_not_shared(spark, tmp_path):
    src = _build(spark, tmp_path / "src")
    clone = src.clone(tmp_path / "dst")
    a = json.loads((src.meta_dir / "v1.metadata.json").read_text())
    b = json.loads((clone.meta_dir / "v1.metadata.json").read_text())
    assert a["table_uuid"] != b["table_uuid"]
    assert a["manifests"] == b["manifests"]  # same root-relative layout


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(
    ops=st.lists(
        st.tuples(
            st.integers(0, 7),                      # which url
            st.sampled_from(["I", "U", "D"]),
        ),
        min_size=3, max_size=14,
    ),
    purge_picks=st.sets(st.integers(0, 9), min_size=1, max_size=3),
    strategies=st.lists(st.sampled_from(["cow", "mor"]), min_size=3, max_size=3),
    do_compact=st.booleans(),
)
def test_purge_property_every_version_scrubbed(
    spark, tmp_path_factory, ops, purge_picks, strategies, do_compact
):
    """Random upsert/delete history (CoW and MoR epochs interleaved,
    optional compaction), then purge a random key set: every retained
    version reads exactly its pre-purge state minus the purged keys."""
    path = tmp_path_factory.mktemp("purgeprop") / "t"
    t = IceTable.create(spark, path, PAGE_SCHEMA, num_partitions=4)
    urls = [f"https://d{i % 3}.example.com/p{i}" for i in range(10)]
    lsn = 0
    batches = [[], [], []]
    for i, (u, op) in enumerate(ops):
        lsn += 1
        batches[i % 3].append(
            (lsn, op, urls[u],
             None if op == "D" else f"<p>v{lsn}</p>".encode())
        )
    for e, (batch, strat) in enumerate(zip(batches, strategies)):
        if batch:
            apply_epoch(t, _batch(spark, batch), e, merge_strategy=strat)
    if do_compact:
        t.compact()
    versions = [
        int(p.name[1:].split(".")[0])
        for p in t.meta_dir.glob("v*.metadata.json")
    ]
    before = {v: _state(t, v) for v in versions}
    targets = sorted({urls[i] for i in purge_picks})
    t.purge_keys(targets)
    for v in versions:
        expect = {k: x for k, x in before[v].items() if k not in targets}
        assert _state(t, v) == expect, f"v{v} drifted"
    for p in t.meta_dir.rglob("*.json"):
        txt = p.read_text()
        assert not any(u in txt for u in targets)
