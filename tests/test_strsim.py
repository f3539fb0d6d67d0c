"""Edit-distance pair join (operators/strsim.py)."""

from __future__ import annotations

from datax_spark.operators.strsim import edit_distance_pairs


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_known_pairs(spark):
    df = spark.createDataFrame(
        [
            (1, "kitten"), (2, "sitten"),   # substitution -> 1
            (3, "kitte"),                   # deletion of 1 -> 1
            (4, "kitten"),                  # identical to 1 -> 0
            (5, "xyz"),                     # unrelated
        ],
        "id long, s string",
    )
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in edit_distance_pairs(df, "id", "s").collect()}
    assert got == {(1, 2): 1, (1, 3): 1, (1, 4): 0, (2, 4): 1, (3, 4): 1}


def test_matches_bruteforce(spark):
    # deterministic corpus: 40 base strings + mutated copies
    base = [f"title{i:03d}xx" for i in range(40)]
    rows, k = [], 0
    for i, s in enumerate(base):
        rows.append((k, s)); k += 1
        if i % 3 == 0:
            rows.append((k, s[:-1]))           # deletion
            k += 1
        if i % 4 == 0:
            rows.append((k, "Z" + s[1:]))       # substitution
            k += 1
    df = spark.createDataFrame(rows, "id long, s string")
    got = {(r["id_a"], r["id_b"]) for r in edit_distance_pairs(df, "id", "s").collect()}
    want = {
        (ia, ib)
        for ia, sa in rows
        for ib, sb in rows
        if ia < ib and _lev(sa, sb) <= 1
    }
    assert got == want and len(want) > 20
