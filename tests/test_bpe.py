"""Distributed BPE training/encoding (functions/bpe.py) — differential
against a pure-python reference implementing the same algorithm
(Sennrich-style pair merges, deterministic (count desc, pair asc)
tie-break, </w> end-of-word marker)."""

from __future__ import annotations

from collections import Counter

from datax_spark.functions.bpe import (
    END,
    encode_bpe,
    merges_table,
    train_bpe,
    word_freq_table,
)

CORPUS = [
    (0, "low lower lowest low low"),
    (1, "new newer newest new new new"),
    (2, "wide wider widest low lower"),
    (3, "new new low the the the the"),
]


def _py_train(texts, n_merges, min_pair_count=2):
    freq = Counter(w for t in texts for w in t.lower().split() if w)
    words = {w: list(w) + [END] for w in freq}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq[w]
        if not pairs:
            break
        # (count desc, left asc, right asc) — the engine's tie-break
        (l, r), n = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if n < min_pair_count:
            break
        merges.append((l, r))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, words


def test_train_matches_python_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = train_bpe(df, n_merges=12)
    want, _ = _py_train([t for _, t in CORPUS], 12)
    assert got == want
    assert len(got) >= 8  # the fixture has at least this much structure


def test_word_freq_is_one_pass(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    wf = {r["w"]: r["count"] for r in word_freq_table(df).collect()}
    assert wf["low"] == 5 and wf["new"] == 6 and wf["the"] == 4


def test_encode_consistent_with_training_segmentation(spark):
    """Encoding the training corpus reproduces the trainer's final
    word segmentation (merges applied in rank order)."""
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = train_bpe(df, n_merges=12)
    _, seg = _py_train([t for _, t in CORPUS], 12)
    enc = {r["doc_id"]: r["tokens"]
           for r in encode_bpe(df, merges).collect()}
    for doc_id, text in CORPUS:
        want = [t for w in text.lower().split() for t in seg[w]]
        assert enc[doc_id] == want, doc_id
    # unseen word still encodes (down to chars where no merge applies)
    new = spark.createDataFrame([(9, "zzz low")], "doc_id long, text string")
    got = {r["doc_id"]: r["tokens"] for r in encode_bpe(new, merges).collect()}
    assert got[9][:3] == ["z", "z", "z"] or got[9][0].startswith("z")
    assert got[9][-len(seg["low"]):] == seg["low"]


def test_merges_table_shape(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = train_bpe(df, n_merges=6)
    t = merges_table(spark, merges)
    rows = t.orderBy("rank").collect()
    assert [(r["left"], r["right"]) for r in rows] == merges
    assert all(r["token"] == r["left"] + r["right"] for r in rows)
