"""Repetition signals (functions/text.py) and corpus line dedup
(operators/dedup.line_dedup): planted-boilerplate tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from datax_spark.functions.text import dup_line_frac, top_ngram_frac, word_ngrams
from datax_spark.operators.dedup import line_dedup

FOOTER = "copyright acme corp all rights reserved"


def test_top_ngram_frac_hand_values(spark):
    df = spark.createDataFrame(
        [
            (0, "a b a b a b c"),  # grams: ab ba ab ba ab bc -> 3/6
            (1, "w x y z"),        # all grams unique -> 1/3
            (2, "solo"),           # no 2-grams
            (3, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["f"]
        for r in df.select("doc_id", top_ngram_frac(F.col("text")).alias("f")).collect()
    }
    assert got == {0: 0.5, 1: round(1 / 3, 4), 2: 0.0, 3: 0.0}


def test_word_ngrams_trigram(spark):
    df = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    row = df.select(word_ngrams(F.col("text"), 3).alias("g")).first()
    assert row["g"] == ["a b c", "b c d"]


def test_dup_line_frac(spark):
    df = spark.createDataFrame(
        [(0, "x\ny\nx\n\n  \nz"), (1, "a\nb")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["f"]
        for r in df.select("doc_id", dup_line_frac(F.col("text")).alias("f")).collect()
    }
    # doc 0: non-blank lines x y x z -> 1 repeat of 4
    assert got == {0: 0.25, 1: 0.0}


def test_line_dedup_drops_boilerplate_keeps_first(spark):
    df = spark.createDataFrame(
        [
            (0, f"alpha beta\n{FOOTER}"),
            (1, f"{FOOTER}\ngamma delta"),
            (2, FOOTER),  # contributes nothing novel -> vanishes
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(df).collect()}
    assert set(out) == {0, 1}
    assert out[0]["text"] == f"alpha beta\n{FOOTER}"
    assert out[0]["n_lines_dropped"] == 0
    assert out[1]["text"] == "gamma delta"
    assert out[1]["n_lines_kept"] == 1 and out[1]["n_lines_dropped"] == 1


def test_line_dedup_preserves_order_and_within_doc_repeats(spark):
    # within one doc the SECOND copy of a line is also a later
    # occurrence -> cut; surviving lines keep their original order
    df = spark.createDataFrame(
        [(7, "one\ntwo\none\nthree")], "doc_id long, text string"
    )
    row = line_dedup(df).first()
    assert row["text"] == "one\ntwo\nthree"
    assert row["n_lines_kept"] == 3 and row["n_lines_dropped"] == 1


def test_pii_redaction_hand_cases(spark):
    from datax_spark.functions.pii import PII_PATTERNS, pii_counts, redact_pii

    cases = [
        (0, "mail me at jo.doe+x@sub.example.co.uk thanks",
         "mail me at <EMAIL> thanks", (1, 0, 0, 0)),
        (1, "server 192.168.0.1 and 10.0.0.255 up",
         "server <IP> and <IP> up", (0, 2, 0, 0)),
        (2, "call +14155550123 or 415-555-0123",
         "call <PHONE> or <PHONE>", (0, 0, 1, 1)),
        (3, "email at 1.2.3.4 is a@1.2.3.4 no tld",
         # 'a@1.2.3.4' has no alphabetic TLD -> not an email; both IPs hit
         "email at <IP> is a@<IP> no tld", (0, 2, 0, 0)),
        (4, "nothing here", "nothing here", (0, 0, 0, 0)),
        (5, "version 1.2.3 stays", "version 1.2.3 stays", (0, 0, 0, 0)),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _, _ in cases], "i long, text string"
    )
    got = {
        r["i"]: r
        for r in df.select(
            "i",
            redact_pii(F.col("text")).alias("red"),
            *pii_counts(F.col("text")),
        ).collect()
    }
    for i, _, want_red, want_counts in cases:
        assert got[i]["red"] == want_red, (i, got[i]["red"])
        names = tuple(f"n_{n}" for n, _, _ in PII_PATTERNS)
        assert tuple(got[i][n] for n in names) == want_counts, (i, dict(got[i].asDict()))


def test_gopher_signals_hand_values(spark):
    from datax_spark.functions.text import gopher_pass, gopher_signals

    text = (
        "the cat sat on the mat with a hat\n"
        "- bullet one\n"
        "- bullet two\n"
        "end of story..."
    )
    df = spark.createDataFrame([(0, text)], "i long, text string")
    sig = gopher_signals(F.col("text"))
    row = df.select(
        *[c.alias(n) for n, c in sig.items()],
        gopher_pass(sig).alias("ok"),
    ).collect()[0]
    assert row["n_words"] == 18          # \s+ split: newlines break words
    assert row["mean_word_len"] == 3.2222  # 58 non-space chars / 18
    assert row["symbol_word_ratio"] == 0.0556  # one '...' / 18
    assert row["bullet_line_frac"] == 0.5      # 2 of 4 lines
    assert row["ellipsis_line_frac"] == 0.25   # 1 of 4 lines
    assert row["alpha_word_frac"] == 0.8889    # the two '-' aren't words
    assert row["n_stopwords"] == 5             # the×2, on, a, of
    assert row["ok"] is True


def test_gopher_pass_rejects_pathologies(spark):
    from datax_spark.functions.text import gopher_pass, gopher_signals

    cases = [
        (0, "- a\n- b\n- c"),                        # all-bullet + too short
        (1, "x # y # z # w # q # r # s # t # u #"),  # symbol stuffing
        (2, ""),                                      # empty
        (3, "the cat sat on the mat with a hat and it is all fine here today"),
    ]
    df = spark.createDataFrame(cases, "i long, text string")
    sig = gopher_signals(F.col("text"))
    got = {r["i"]: r["ok"] for r in df.select("i", gopher_pass(sig).alias("ok")).collect()}
    assert got == {0: False, 1: False, 2: False, 3: True}


def test_compression_ratio_separates_boilerplate_from_prose(spark):
    from datax_spark.functions.text import compression_ratio_udf

    ratio = compression_ratio_udf()
    import hashlib

    prose = (
        "The river bent east of the village where the old mill stood, and "
        "every morning the baker carried flour across the wooden bridge while "
        "children counted barges sliding under it. Nobody remembered who built "
        "the first arch, though the mason's marks were still visible when the "
        "water dropped in August, odd letters worn smooth by a century of ice "
        "and thaw."
    )
    noise = "".join(  # ~6.55 bits/char: printable bytes off md5 digests
        chr(33 + b % 94)
        for i in range(60)
        for b in hashlib.md5(str(i).encode()).digest()
    )
    df = spark.createDataFrame(
        [(0, prose), (1, "buy now " * 200), (2, noise), (3, "")],
        "i long, text string",
    )
    got = {r["i"]: r["r"] for r in df.select("i", ratio(F.col("text")).alias("r")).collect()}
    assert got[1] < got[0] < got[2]   # boilerplate < prose < noise
    assert got[3] == 1.0
    # plan: Arrow transport, not row-at-a-time Python
    plan = df.select(ratio(F.col("text")))._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan
