"""Column-level patch folding (operators/patch.py) — differential vs a
sequential pure-python fold of the same I/U/D partial-image semantics."""

from __future__ import annotations

import random

from datax_spark.operators.patch import patch_fold

COLS = ["a", "b"]


def _py_fold(events):
    """events: (op, key, lsn, a, b) — apply in lsn order per key."""
    state: dict = {}
    last_lsn: dict = {}
    for op, k, lsn, a, b in sorted(events, key=lambda e: e[2]):
        last_lsn[k] = lsn
        if op == "I":
            state[k] = {"a": a, "b": b}
        elif op == "D":
            state.pop(k, None)
        else:  # U patch: null = keep; patch on a missing row creates it
            row = state.setdefault(k, {"a": None, "b": None})
            if a is not None:
                row["a"] = a
            if b is not None:
                row["b"] = b
    return {k: (v["a"], v["b"], last_lsn[k]) for k, v in state.items()}


CASES = [
    ("I", "k1", 1, 1, 10), ("U", "k1", 2, None, 20),      # patch keeps a
    ("I", "k2", 1, 5, 50), ("I", "k2", 3, None, 70),      # re-insert RESETS a
    ("I", "k3", 1, 9, 90), ("D", "k3", 2),                # plain delete
    ("I", "k4", 1, 4, 40), ("D", "k4", 2), ("U", "k4", 3, None, 44),  # patch after D re-creates
    ("U", "k5", 1, 7, None), ("U", "k5", 2, None, 77),    # pure patches, no image
    ("U", "k6", 1, 3, 30), ("I", "k6", 2, None, 60),      # later image supersedes patch
]


def _norm(rows):
    return [(r[0], r[1], r[2]) if len(r) == 3 else r for r in rows]


def _to_df(spark, events):
    rows = [(op, k, lsn, *(tuple(rest) + (None,) * (2 - len(rest))))
            for op, k, lsn, *rest in events]
    return spark.createDataFrame(
        rows, "op string, url string, lsn long, a long, b long"
    )


def test_patch_fold_tricky_cases(spark):
    df = _to_df(spark, CASES)
    got = {r["url"]: (r["a"], r["b"], r["lsn"])
           for r in patch_fold(df, payload_cols=COLS).collect()}
    want = _py_fold([(op, k, lsn, *(tuple(rest) + (None,) * (2 - len(rest))))
                     for op, k, lsn, *rest in CASES])
    assert got == want
    assert "k3" not in got
    assert got["k2"] == (None, 70, 3)   # the re-insert's null a SURVIVES
    assert got["k4"] == (None, 44, 3)   # post-delete patch starts fresh
    assert got["k5"] == (7, 77, 2)


def test_patch_fold_randomized(spark):
    rng = random.Random(42)
    keys = [f"k{i}" for i in range(15)]
    events = []
    for lsn in range(1, 301):
        k = rng.choice(keys)
        op = rng.choices(["I", "U", "D"], weights=[3, 6, 1])[0]
        a = rng.randint(0, 9) if rng.random() > 0.4 else None
        b = rng.randint(0, 9) if rng.random() > 0.4 else None
        events.append((op, k, lsn, a, b) if op != "D" else (op, k, lsn, None, None))
    df = _to_df(spark, events)
    got = {r["url"]: (r["a"], r["b"], r["lsn"])
           for r in patch_fold(df, payload_cols=COLS).collect()}
    assert got == _py_fold(events)


def test_patch_fold_with_base_state(spark):
    state = spark.createDataFrame(
        [("k1", 1, 10, 5), ("k2", 2, 20, 5)], "url string, a long, b long, _lsn long"
    )
    events = [("U", "k1", 7, None, 11), ("U", "k3", 8, 3, None),
              ("U", "k1", 4, 99, None)]  # lsn 4 < state lsn 5: superseded
    df = _to_df(spark, events)
    got = {r["url"]: (r["a"], r["b"], r["lsn"])
           for r in patch_fold(df, payload_cols=COLS, state=state).collect()}
    assert got == {
        "k1": (1, 11, 7),   # stale patch ignored, fresh patch applied
        "k2": (2, 20, 5),   # untouched state row carries through
        "k3": (3, None, 8), # patch on absent key creates it
    }


def test_patch_fold_single_exchange(spark):
    """Everything computes as windows over ONE partitionBy(key): the
    plan carries exactly one hash exchange on the key."""
    df = _to_df(spark, CASES)
    plan = patch_fold(df, payload_cols=COLS)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(url") == 1
