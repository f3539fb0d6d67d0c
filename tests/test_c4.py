"""C4-style line cleaning (functions/text.py c4_clean) — every public
rule exercised on fixture pages."""

from __future__ import annotations

from datax_spark.functions.text import c4_clean

DOCS = [
    # kept: 3 qualifying lines; short line and unterminated line drop
    (
        1,
        "This is a perfectly fine first sentence.\n"
        "Too short.\n"
        "this line has enough words but no terminal punctuation\n"
        "Another good sentence with plenty of words here!\n"
        'A third keeper line that ends in a quote."',
    ),
    # dropped: page mentions lorem ipsum
    (2, "Lorem Ipsum dolor sit amet makes this whole page boilerplate.\nStill dropped despite this fine sentence."),
    # dropped: page contains a brace (code)
    (3, "A sentence that would pass the line rules easily.\nfunction f() { return 1; }"),
    # dropped: only 2 kept lines < min_lines=3
    (
        4,
        "One good line that satisfies every single rule here.\n"
        "Second good line that satisfies every single rule too.",
    ),
    # javascript rule: the line mentioning JavaScript drops
    (
        5,
        "Please enable JavaScript to view the comments properly.\n"
        "A real content sentence with enough words in it.\n"
        "Another real content sentence with enough words too.\n"
        "And a third real content sentence to clear the gate.",
    ),
]


def test_c4_clean_rules(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in c4_clean(df, min_words=5, min_lines=3).collect()}
    assert set(out) == {1, 5}
    assert out[1]["n_lines_orig"] == 5
    assert out[1]["n_lines_kept"] == 3
    assert out[1]["text"].splitlines() == [
        "This is a perfectly fine first sentence.",
        "Another good sentence with plenty of words here!",
        'A third keeper line that ends in a quote."',
    ]
    # the JavaScript line is gone, the three content lines stay
    assert out[5]["n_lines_kept"] == 3
    assert "JavaScript" not in out[5]["text"]


def test_c4_clean_trailing_newline_counts(spark):
    # split(..., -1) semantics: a trailing newline is a real empty line
    df = spark.createDataFrame([(1, "Good sentence one two three four.\n")], ["doc_id", "text"])
    row = c4_clean(df, min_words=5, min_lines=1).collect()[0]
    assert row["n_lines_orig"] == 2
    assert row["n_lines_kept"] == 1


def test_c4_clean_single_projection_plan(spark):
    df = spark.createDataFrame([(1, "x.")], ["doc_id", "text"])
    plan = c4_clean(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # one scan, zero shuffles
