"""Incremental materialized-view maintenance: maintain_agg_view over
read_changes(pre_images=True) must equal a full recompute at every
version — including group-moving updates, delete-drained groups, and
all-NULL-measure groups (the SUM-identity trap).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F, types as T

from datax_spark.icetable.table import IceTable
from datax_spark.operators.incremental_view import (
    agg_view,
    maintain_agg_view,
)
from datax_spark.operators.merge import apply_epoch

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("grp", T.StringType()),
        T.StructField("val", T.LongType()),
    ]
)


def _mk(spark, path, P=4):
    return IceTable.create(spark, path, SCHEMA, num_partitions=P)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "url string, grp string, val long, _pid int, _lsn long"
    )


def _view_rows(df):
    return {
        tuple(r[c] for c in ("grp",)): (r["n_rows"], r["sum_val"], r["nn_val"])
        for r in df.collect()
    }


def _build(spark, path):
    """v1: a/b/c across two groups · v2: a moves g1→g2 and changes val,
    +d(null val) · v3: delete b and c (drains g1 to the null-val d)."""
    t = _mk(spark, path)
    f0 = t.stage_data_files(
        _df(
            spark,
            [
                ("a", "g1", 10, 0, 10),
                ("b", "g1", 2, 1, 11),
                ("c", "g1", 3, 2, 12),
            ],
        ),
        epoch=0,
    )
    t.commit(0, {0, 1, 2}, f0)
    pid0 = [f for f in t.manifest_entries() if f["partition_id"] == 0]
    f1 = t.stage_data_files(
        _df(spark, [("a", "g2", 40, 0, 20), ("d", "g1", None, 3, 21)]),
        epoch=1,
    )
    t.commit(1, {0, 3}, f1, removed=pid0)
    gone = [
        f
        for f in t.manifest_entries()
        if f["partition_id"] in (1, 2)
    ]
    t.commit(2, {1, 2}, [], removed=gone)
    return t


def test_pre_images_four_op_form(spark, tmp_path):
    t = _build(spark, tmp_path / "t")
    rows = {
        (r["_op"], r["url"]): (r["grp"], r["val"], r["_lsn"])
        for r in t.read_changes(1, 2, pre_images=True).collect()
    }
    assert rows == {
        ("UB", "a"): ("g1", 10, 10),  # pre-image with its own LSN
        ("UA", "a"): ("g2", 40, 20),
        ("I", "d"): ("g1", None, 21),
    }
    # D carries the pre-image (and lsn+1, matching the two-op feed)
    rows23 = {
        (r["_op"], r["url"]): (r["grp"], r["val"], r["_lsn"])
        for r in t.read_changes(2, 3, pre_images=True).collect()
    }
    assert rows23 == {
        ("D", "b"): ("g1", 2, 12),
        ("D", "c"): ("g1", 3, 13),
    }


def test_pre_images_default_equivalence(spark, tmp_path):
    """Dropping UB rows and renaming UA→U reproduces the two-op feed."""
    t = _build(spark, tmp_path / "t")
    four = (
        t.read_changes(1, 3, pre_images=True)
        .filter(F.col("_op") != "UB")
        .withColumn(
            "_op", F.when(F.col("_op") == "UA", "U").otherwise(F.col("_op"))
        )
    )
    two = t.read_changes(1, 3)
    as_set = lambda df: {tuple(r) for r in df.collect()}
    assert as_set(four) == as_set(two)


def test_maintain_matches_recompute_each_step(spark, tmp_path):
    """view(v+1) = maintain(view(v), changes(v, v+1)) for every commit,
    covering group-move (v1→v2), null measures, and group drain (v2→v3)."""
    t = _build(spark, tmp_path / "t")
    view = agg_view(t.read(version=1), ["grp"], ["val"])
    for v in (1, 2):
        ch = t.read_changes(v, v + 1, pre_images=True)
        view = maintain_agg_view(view, ch, ["grp"], ["val"])
        expect = agg_view(t.read(version=v + 1), ["grp"], ["val"])
        assert _view_rows(view) == _view_rows(expect)
    # the drained group's sum must be NULL (only d's null val remains),
    # not the 0 a count-less maintainer would decay to
    final = _view_rows(view)
    assert final[("g1",)] == (1, None, 0)
    assert final[("g2",)] == (1, 40, 1)


def test_bare_two_op_feed_raises(spark, tmp_path):
    t = _build(spark, tmp_path / "t")
    view = agg_view(t.read(version=1), ["grp"], ["val"])
    bad = t.read_changes(1, 2)  # no pre-images
    try:
        maintain_agg_view(view, bad, ["grp"], ["val"]).collect()
    except Exception as e:  # Spark wraps raise_error in a SparkRuntimeException
        assert "pre-images" in str(e)
    else:
        raise AssertionError("bare U feed must fail loudly")


def test_null_group_key_is_a_group(spark, tmp_path):
    """GROUP BY keeps NULL keys; the null-safe merge must not duplicate
    or drop them."""
    t = _mk(spark, tmp_path / "t")
    f0 = t.stage_data_files(
        _df(spark, [("a", None, 5, 0, 10), ("b", "g", 7, 1, 11)]), epoch=0
    )
    t.commit(0, {0, 1}, f0)
    f1 = t.stage_data_files(_df(spark, [("c", None, 9, 2, 20)]), epoch=1)
    t.commit(1, {2}, f1)
    view = agg_view(t.read(version=1), ["grp"], ["val"])
    view = maintain_agg_view(
        view, t.read_changes(1, 2, pre_images=True), ["grp"], ["val"]
    )
    expect = agg_view(t.read(version=2), ["grp"], ["val"])
    assert _view_rows(view) == _view_rows(expect)
    assert _view_rows(view)[(None,)] == (2, 14, 2)


@st.composite
def _op_seqs(draw):
    """Sequences of per-version upsert/delete batches over a small key
    domain, values sometimes NULL, groups sometimes moving."""
    n_versions = draw(st.integers(1, 4))
    seqs = []
    for _ in range(n_versions):
        ops = draw(
            st.lists(
                st.tuples(
                    st.sampled_from(["k0", "k1", "k2", "k3", "k4"]),
                    st.sampled_from(["I", "D"]),
                    st.sampled_from(["g1", "g2", None]),
                    st.one_of(st.none(), st.integers(-5, 99)),
                ),
                min_size=1,
                max_size=6,
                unique_by=lambda o: o[0],
            )
        )
        seqs.append(ops)
    return seqs


@settings(
    max_examples=15, deadline=None, derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(_op_seqs())
def test_property_maintain_equals_recompute(spark, tmp_path_factory, seqs):
    """Random upsert/delete epochs through the REAL merge path: chaining
    maintain_agg_view across every consecutive version pair ends exactly
    at the final recompute."""
    base = tmp_path_factory.mktemp("ivm")
    t = IceTable.create(spark, base / "t", SCHEMA, num_partitions=4)
    lsn = 100
    for epoch, ops in enumerate(seqs):
        rows = []
        for key, op, grp, val in ops:
            lsn += 1
            rows.append((op, key, grp, val, lsn))
        ev = spark.createDataFrame(
            rows, "op string, url string, grp string, val long, lsn long"
        )
        apply_epoch(t, ev, epoch=epoch, extract=False)
    final_v = t.current_version()
    # first non-empty readable version as the seed view
    view = agg_view(t.read(version=1), ["grp"], ["val"])
    for v in range(1, final_v):
        view = maintain_agg_view(
            view, t.read_changes(v, v + 1, pre_images=True), ["grp"], ["val"]
        )
    expect = agg_view(t.read(version=final_v), ["grp"], ["val"])
    assert _view_rows(view) == _view_rows(expect)


# ------------------- maintained JOIN views ------------------- #


def _mk_src(spark, path, cols_schema, rows):
    t = IceTable.create(
        spark, path, cols_schema, num_partitions=2, key_column="url"
    )
    t.bulk_overwrite(spark.createDataFrame(rows, cols_schema), epoch=0)
    return t


def _join_recompute(a, b):
    key = "url"
    bb = b.drop(*[c for c in b.columns if c != key and c in a.columns])
    return a.join(bb, key)


def _rows_set(df):
    return sorted(tuple(r) for r in df.collect())


def test_join_view_tracks_both_sides(spark, tmp_path):
    """V = A ⋈ B maintained from churn on EITHER side equals the full
    re-join at every step: bootstrap, one-side-only keys, update
    propagation, delete of one side, re-insert resurrection."""
    from datax_spark.operators.incremental_view import (
        create_join_view,
        sync_join_view,
    )

    a_schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("val", T.LongType()),
        ]
    )
    b_schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("meta", T.StringType()),
        ]
    )
    a = _mk_src(spark, tmp_path / "a", a_schema,
                [("k1", 1), ("k2", 2), ("k3", 3)])
    b = _mk_src(spark, tmp_path / "b", b_schema,
                [("k2", "m2"), ("k3", "m3"), ("k4", "m4")])
    v = create_join_view(spark, tmp_path / "v", a, b, num_partitions=2)

    def check():
        want = _rows_set(
            _join_recompute(a.read(), b.read()).select("url", "val", "meta")
        )
        got = _rows_set(v.read().select("url", "val", "meta"))
        assert got == want, (got, want)

    out = sync_join_view(v, a, b)  # bootstrap: k2, k3 joined
    assert out["epoch"] == 0
    check()
    assert {r["url"] for r in v.read().collect()} == {"k2", "k3"}

    # churn A only: update k2's val, delete k3, insert k4 (now joins)
    apply_epoch(
        a,
        spark.createDataFrame(
            [("k2", 20, "U", 10), ("k3", None, "D", 11), ("k4", 4, "I", 12)],
            "url string, val long, op string, lsn long",
        ),
        epoch=1,
        extract=False,
    )
    sync_join_view(v, a, b)
    check()
    assert {r["url"] for r in v.read().collect()} == {"k2", "k4"}

    # churn B only: delete k2's B side (view row must die), update k4
    apply_epoch(
        b,
        spark.createDataFrame(
            [("k2", None, "D", 10), ("k4", "m4x", "U", 11)],
            "url string, meta string, op string, lsn long",
        ),
        epoch=1,
        extract=False,
    )
    sync_join_view(v, a, b)
    check()

    # both sides in one sync + resurrection of k3
    apply_epoch(
        a,
        spark.createDataFrame(
            [("k3", 30, "I", 20)],
            "url string, val long, op string, lsn long",
        ),
        epoch=2,
        extract=False,
    )
    apply_epoch(
        b,
        spark.createDataFrame(
            [("k3", "m3b", "I", 20), ("k4", None, "D", 21)],
            "url string, meta string, op string, lsn long",
        ),
        epoch=2,
        extract=False,
    )
    sync_join_view(v, a, b)
    check()
    assert {r["url"] for r in v.read().collect()} == {"k3"}

    # cursor current: no-op
    assert sync_join_view(v, a, b)["epoch"] is None


def test_join_view_collision_and_key_guards(spark, tmp_path):
    from datax_spark.operators.incremental_view import create_join_view

    s1 = T.StructType(
        [T.StructField("url", T.StringType()), T.StructField("x", T.LongType())]
    )
    s2 = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("x", T.LongType())]
    )
    a = IceTable.create(spark, tmp_path / "a", s1, num_partitions=2,
                        key_column="url")
    b = IceTable.create(spark, tmp_path / "b", s1, num_partitions=2,
                        key_column="url")
    import pytest

    with pytest.raises(ValueError, match="collision"):
        create_join_view(spark, tmp_path / "v", a, b)
    c = IceTable.create(spark, tmp_path / "c", s2, num_partitions=2,
                        key_column="k")
    with pytest.raises(ValueError, match="shared key"):
        create_join_view(spark, tmp_path / "v2", a, c)
