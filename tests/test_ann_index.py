"""Persisted IVF index (operators/ann_index.py): build/probe round trip
must be bit-equal to the unpersisted trained-IVF operator, and probing
must scan only the probed cells' partitions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datax_spark.operators.ann_index import IvfIndex
from datax_spark.operators.similarity import ivf_trained_topk

PARAMS = dict(n_cells=8, n_iter=2)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


@pytest.fixture(scope="module")
def index(spark, emb, tmp_path_factory):
    root = tmp_path_factory.mktemp("ivf") / "idx"
    return IvfIndex.build(emb, root, **PARAMS)


def _rows(df):
    return sorted(
        (r["query_id"], r["probe_cell"], r["neighbor_id"], r["cos_sim"], r["rank"])
        for r in df.collect()
    )


def test_probe_equals_unpersisted_operator(spark, emb, index):
    queries = emb.filter(F.col("vec_id") < 8)
    got = _rows(index.probe(queries, k=3, n_probe=2))
    want = _rows(
        ivf_trained_topk(emb, queries, k=3, n_probe=2, **PARAMS)
    )
    assert got == want and len(got) > 0


def test_meta_and_load_roundtrip(spark, index, emb):
    loaded = IvfIndex(spark, index.root)
    assert loaded.meta["n_cells"] == 8
    assert loaded.meta["rows"] == emb.count()
    assert loaded.centroids().count() <= 8


def test_probe_scans_only_probed_cells(spark, index, emb):
    queries = emb.filter(F.col("vec_id") < 2)
    out = index.probe(queries, k=3, n_probe=1)
    cells_in_result = {r["probe_cell"] for r in out.collect()}
    # with n_probe=1 each query reads exactly one cell
    assert len(cells_in_result) <= 2
    # the pruned corpus relation lists only the probed dirs
    plan = index.corpus(cells=sorted(cells_in_result))._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell" in plan or "cell#" in plan


def test_unloadable_without_meta(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        IvfIndex(spark, tmp_path / "nope")


def test_incremental_add_probes_find_new_vectors(spark, emb, tmp_path):
    root = tmp_path / "idx"
    base = emb.filter(F.col("vec_id") >= 10)
    idx = IvfIndex.build(base, root, **PARAMS)
    rows_before = idx.meta["rows"]
    new = emb.filter(F.col("vec_id") < 10)
    assert idx.add(new) == 10
    assert idx.meta["rows"] == rows_before + 10
    # an added vector's exact duplicate query must surface it at rank 1
    # (cos 1.0 with itself is excluded; probe with a copy under new id)
    q = new.filter(F.col("vec_id") == 3).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    top = idx.probe(q, k=1, n_probe=2).first()
    assert top["neighbor_id"] == 3 and top["cos_sim"] >= 0.9999


# ---------- CDC-maintained index (v2: segments + tombstones) ---------- #


def test_sync_matches_bruteforce_and_compact(spark, tmp_path):
    """The IVF index is a CDC consumer: after I/U/D epochs on the
    vector table through the real merge path, sync() keeps the index at
    the table state — probed with n_probe=n_cells (every cell scanned,
    so the frozen quantizer cannot mask a stale row) the result equals
    exact brute force over the CURRENT table. compact() folds the
    tombstones without changing results."""
    from pyspark.sql import types as T

    from datax_spark.icetable.table import IceTable
    from datax_spark.operators.merge import apply_epoch
    from datax_spark.operators.similarity import bruteforce_topk

    dim = 4
    base = [
        (i, [float((i * 7 + j * 3) % 11 - 5) for j in range(dim)])
        for i in range(20)
    ]
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    t = IceTable.create(
        spark, tmp_path / "t", schema, num_partitions=2, key_column="url"
    )
    t.bulk_overwrite(
        spark.createDataFrame([(f"u{i}", i, v) for i, v in base], schema),
        epoch=0,
    )
    idx = IvfIndex.build_from_table(t, tmp_path / "idx", n_cells=2, n_iter=2)

    # update vec 0 (negate — cosine-visible), delete vec 3, insert 21
    apply_epoch(
        t,
        spark.createDataFrame(
            [
                ("u0", 0, [-x for x in base[0][1]], "U", 10),
                ("u3", 3, None, "D", 11),
                ("u21", 21, [1.0, -2.0, 3.0, -4.0], "I", 12),
            ],
            "url string, vec_id long, embedding array<double>, op string, lsn long",
        ),
        epoch=1,
        extract=False,
    )
    out = idx.sync(t)
    assert out["removed"] == 2 and out["added"] == 2
    assert idx.meta["rows"] == 20  # 20 - 1 del - 1 upd + 1 upd + 1 ins

    queries = spark.createDataFrame(
        [(100, [1.0, 0.0, -1.0, 2.0]), (101, [0.5, 2.0, 0.0, -1.0])],
        "vec_id long, embedding array<double>",
    )
    got = idx.probe(queries, k=5, n_probe=2).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )
    want = bruteforce_topk(t.read().select("vec_id", "embedding"), queries, k=5)
    gr = sorted(map(tuple, got.collect()))
    wr = sorted(map(tuple, want.collect()))
    assert gr == wr and len(gr) == 10

    # the deleted and pre-update generations are really invisible
    live_ids = {r["vec_id"] for r in idx._live_corpus(None).collect()}
    assert 3 not in live_ids and 21 in live_ids and len(live_ids) == 20

    idx.compact()
    assert not (tmp_path / "idx" / "tombstones").exists()
    got2 = idx.probe(queries, k=5, n_probe=2).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )
    assert sorted(map(tuple, got2.collect())) == wr
    # physical fold: corpus now holds exactly the live rows
    assert idx.corpus(None).count() == 20

    # cursor no-op
    assert idx.sync(t)["added"] == 0


def test_drift_report_advisory(spark, tmp_path):
    """The frozen quantizer's rebuild advisory: fresh index is calm;
    tripling the corpus through adds trips needs_rebuild on growth."""
    dim = 4
    base = spark.createDataFrame(
        [(i, [float((i * 3 + j) % 7 - 3) for j in range(dim)])
         for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    idx = IvfIndex.build(base, tmp_path / "idx", n_cells=2, n_iter=2)
    rep = idx.drift_report()
    assert rep["built_rows"] == rep["live_rows"] == 10
    assert not rep["needs_rebuild"]

    more = spark.createDataFrame(
        [(100 + i, [float((i * 5 + j) % 9 - 4) for j in range(dim)])
         for i in range(25)],
        "vec_id long, embedding array<double>",
    )
    idx.add(more)
    rep = idx.drift_report()
    assert rep["live_rows"] == 35 and rep["growth"] == 3.5
    assert rep["needs_rebuild"]


def test_purge_ids_erases_vectors(spark, tmp_path):
    """After purge_ids, no corpus row (vector or PQ codes) of the id
    survives on disk and the row count is exact."""
    dim = 4
    base = spark.createDataFrame(
        [(i, [float((i * 3 + j) % 7 - 3) for j in range(dim)])
         for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    idx = IvfIndex.build(base, tmp_path / "idx", n_cells=2, n_iter=2)
    assert idx.purge_ids([3, 777]) == {"purged": 1}
    assert idx.corpus(None).filter(F.col("vec_id") == 3).count() == 0
    assert idx.meta["rows"] == 9
    assert not (tmp_path / "idx" / "tombstones").exists()


# ------ property: sync ≡ brute force under ANY I/U/D/compact history ------ #

from hypothesis import HealthCheck, given
from hypothesis import settings as hsettings
from hypothesis import strategies as st

_VKEYS = ["a", "b", "c", "d"]


def _vec(seed: int) -> list:
    return [float((seed * 7 + j * 3) % 11 - 5) for j in range(4)]


_vop = st.one_of(
    st.dictionaries(st.sampled_from(_VKEYS), st.integers(0, 6),
                    min_size=1, max_size=2),  # upserts: key -> vector seed
    st.sets(st.sampled_from(_VKEYS), min_size=1, max_size=2),  # deletes
    st.just("C"),                              # index compact
)


@hsettings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_vop, min_size=1, max_size=4))
def test_ivf_sync_equals_bruteforce_property(spark, tmp_path_factory, ops):
    """Differential: ANY upsert/delete/compact history through the real
    merge path keeps the synced IVF index — probed at n_probe=n_cells,
    so the frozen quantizer cannot mask staleness — equal to exact
    brute force over the live table, and the row count exact.
    Derandomized."""
    from pyspark.sql import types as T

    from datax_spark.icetable.table import IceTable
    from datax_spark.operators.merge import apply_epoch
    from datax_spark.operators.similarity import bruteforce_topk

    base = tmp_path_factory.mktemp("ivf_prop")
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    t = IceTable.create(spark, base / "t", schema, num_partitions=2,
                        key_column="url")
    # seed corpus so the quantizer has something to train on
    seeds = [(f"s{i}", 100 + i, _vec(i + 20)) for i in range(6)]
    t.bulk_overwrite(spark.createDataFrame(seeds, schema), epoch=0)
    idx = IvfIndex.build_from_table(t, base / "idx", n_cells=2, n_iter=2)
    model: dict[str, int] = {}
    lsn = 0
    epoch = 1
    for op in ops:
        if op == "C":
            idx.compact()
            continue
        if isinstance(op, dict):
            lsn += 1
            rows = [
                (k, _VKEYS.index(k), _vec(v),
                 "U" if k in model else "I", lsn)
                for k, v in sorted(op.items())
            ]
            model.update(op)
        else:
            present = sorted(k for k in op if k in model)
            if not present:
                continue
            lsn += 1
            rows = [(k, _VKEYS.index(k), None, "D", lsn) for k in present]
            for k in present:
                del model[k]
        apply_epoch(
            t,
            spark.createDataFrame(
                rows,
                "url string, vec_id long, embedding array<double>, "
                "op string, lsn long",
            ),
            epoch=epoch,
            extract=False,
        )
        epoch += 1
        idx.sync(t)

    assert idx.meta["rows"] == 6 + len(model)
    queries = spark.createDataFrame(
        [(1000, [1.0, -1.0, 2.0, 0.5]), (1001, [0.0, 2.0, -1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    got = sorted(
        map(tuple, idx.probe(queries, k=4, n_probe=2)
            .select("query_id", "neighbor_id", "cos_sim", "rank").collect())
    )
    want = sorted(
        map(tuple, bruteforce_topk(
            t.read().select("vec_id", "embedding"), queries, k=4
        ).collect())
    )
    assert got == want, (ops, model)
