"""Text-analysis operators for training-data pipelines — all built-in
`pyspark.sql.functions` expressions (JVM-side, whole-stage codegen; no
Python on the hot path). Each returns Column(s) usable over the
`documents` table or any string column.

Design notes for 100 TB: every function here is a narrow projection over
one string column — scans prune to (doc_id, text) at the parquet footer,
and the expressions pipeline inside one codegen stage (no shuffle at all
until the caller aggregates).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# word-marker tables for the n-gram-heuristic language identifier.
# Deliberately tiny and frozen — deterministic, explainable, and easily
# mirrored in the DuckDB oracle. Real pipelines swap in fastText etc.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "es", "y"),
    "zh": ("的", "是", "了", "在", "我"),
}

STOPWORDS_EN = ("the", "and", "of", "to", "a", "in", "is", "it", "for", "on")

# BPE-ish token pattern: letter runs, digit runs, single other glyphs
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def _count_marker(text: Column, marker: str) -> Column:
    """Occurrences of ``marker`` as a token: length-difference trick —
    pure string arithmetic, no regex engine, vectorizes in codegen."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    needle = f" {marker} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("int")


def lang_scores(text: Column) -> dict[str, Column]:
    return {
        lang: sum(_count_marker(text, m) for m in markers).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """argmax over marker scores; ties break by language-code order
    (deterministic). 'und' when no marker hits at all."""
    scores = lang_scores(text)
    langs = sorted(scores)
    best = F.greatest(*[scores[lang] for lang in langs])
    result = F.lit("und")
    for lang in reversed(langs):  # earlier langs override on ties
        result = F.when(scores[lang] == best, F.lit(lang)).otherwise(result)
    return F.when(best > 0, result).otherwise(F.lit("und"))


def ws_token_count(text: Column) -> Column:
    """Whitespace tokens, empty tokens excluded."""
    return F.size(F.filter(F.split(text, " "), lambda t: t != ""))


def regex_token_count(text: Column) -> Column:
    """BPE-ish token count via TOKEN_REGEX."""
    return F.regexp_count(text, F.lit(TOKEN_REGEX))


def punct_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit("[^A-Za-z0-9\\s]"))


def stopword_count(text: Column) -> Column:
    return sum(_count_marker(F.lower(text), s) for s in STOPWORDS_EN).cast("int")


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: length band, reasonable
    mean word length, some stopwords, low punctuation density."""
    n_tok = ws_token_count(text)
    n_char = F.length(text)
    mean_wl = F.when(n_tok > 0, n_char / n_tok).otherwise(F.lit(0.0))
    len_ok = F.when((n_char >= 100) & (n_char <= 20000), 1.0).otherwise(0.3)
    wl_ok = F.when((mean_wl >= 3.0) & (mean_wl <= 12.0), 1.0).otherwise(0.4)
    stop_ratio = F.when(n_tok > 0, stopword_count(text) / n_tok).otherwise(F.lit(0.0))
    stop_ok = F.when(stop_ratio >= 0.05, 1.0).otherwise(0.5)
    punct_ratio = F.when(n_char > 0, punct_count(text) / n_char).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio <= 0.2, 1.0).otherwise(0.2)
    return F.round((len_ok * 0.3 + wl_ok * 0.3 + stop_ok * 0.2 + punct_ok * 0.2), 4)


def normalized_fingerprint(text: Column) -> Column:
    """Document fingerprint over canonicalized content: lowercase +
    whitespace-collapse, then md5. Stable under formatting-only edits."""
    canon = F.trim(F.regexp_replace(F.lower(text), "\\s+", " "))
    return F.md5(canon)


def word_ngrams(text: Column, n: int) -> Column:
    """Array of word n-grams (space-joined) over whitespace tokens;
    empty array when the document has fewer than ``n`` tokens."""
    toks = F.filter(F.split(text, " "), lambda t: t != "")
    if n == 1:
        return toks
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    return F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")),
    ).otherwise(F.array().cast("array<string>"))


def top_ngram_frac(text: Column, n: int = 2) -> Column:
    """Fraction of the document's word n-grams taken by the single most
    frequent one — the Gopher-style repetition signal (a page whose top
    2-gram covers a third of the text is keyword stuffing / boilerplate,
    not prose). Computed in LINEAR time per row: sort the gram array
    once and run-length-scan it with one `aggregate` fold — the naive
    per-distinct-gram recount is O(grams²) per row, which at 3k-token
    web pages is 9M comparisons per document. 0.0 when no n-grams."""
    grams = word_ngrams(text, n)
    sg = F.array_sort(grams)
    zero = F.lit(0).cast("int")
    acc0 = F.struct(
        F.lit("").alias("prev"), zero.alias("run"), zero.alias("best")
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    best = F.aggregate(sg, acc0, step, lambda acc: acc["best"])
    return F.when(
        F.size(grams) > 0, F.round(best / F.size(grams), 4)
    ).otherwise(F.lit(0.0))


def gopher_signals(text: Column) -> dict[str, Column]:
    """The Gopher-paper quality-rule signal set (Rae et al. 2021, §A1.1),
    each as one codegen expression over the text column — the standard
    pre-filter a web-scale training pipeline runs before any dedup:

    * ``n_words`` — whitespace word count;
    * ``mean_word_len`` — non-space chars / words;
    * ``symbol_word_ratio`` — (# marks + literal ``...``) per word;
    * ``bullet_line_frac`` / ``ellipsis_line_frac`` — fraction of
      non-blank lines starting with a bullet / ending with an ellipsis;
    * ``alpha_word_frac`` — fraction of words containing a letter;
    * ``n_stopwords`` — hits from the frozen STOPWORDS_EN list.

    All ratios round to 4dp so the DuckDB oracle compares exactly.
    Divisions guard n=0 (empty doc ⇒ 0.0, not NULL). Words split on any
    whitespace run (not just spaces — these signals are line-aware)."""
    toks = F.filter(F.split(text, "\\s+"), lambda t: t != "")
    n_words = F.size(toks)
    n_alpha_chars = F.length(F.regexp_replace(text, "\\s", ""))
    lines = F.filter(F.split(text, "\n", -1), lambda x: F.trim(x) != "")
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(lines, lambda x: F.trim(x).rlike("^[-*•‣◦]"))
    )
    n_ellipsis = F.size(F.filter(lines, lambda x: F.trim(x).rlike("(\\.\\.\\.|…)$")))
    n_symbols = (
        F.regexp_count(text, F.lit("#"))
        + F.regexp_count(text, F.lit("(\\.\\.\\.|…)"))  # both ellipsis forms,
        # matching ellipsis_line_frac below (Gopher counts '#' or '…')
    )
    n_alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    div = lambda a, b: F.round(F.when(b > 0, a / b).otherwise(F.lit(0.0)), 4)
    return {
        "n_words": n_words.cast("bigint"),
        "mean_word_len": div(n_alpha_chars, n_words),
        "symbol_word_ratio": div(n_symbols, n_words),
        "bullet_line_frac": div(n_bullet, n_lines),
        "ellipsis_line_frac": div(n_ellipsis, n_lines),
        "alpha_word_frac": div(n_alpha_words, n_words),
        "n_stopwords": stopword_count(text).cast("bigint"),
    }


def gopher_pass(
    sig: dict[str, Column],
    min_words: int = 8,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopwords: int = 2,
) -> Column:
    """Boolean Gopher-rules verdict over a `gopher_signals` dict.
    Thresholds default to the published ones (word band shrunk to fit
    synthetic fixtures; pass the paper's 50 on a real corpus)."""
    s = sig
    return (
        s["n_words"].between(min_words, max_words)
        & s["mean_word_len"].between(min_mean_word_len, max_mean_word_len)
        & (s["symbol_word_ratio"] <= max_symbol_word_ratio)
        & (s["bullet_line_frac"] <= max_bullet_line_frac)
        & (s["ellipsis_line_frac"] <= max_ellipsis_line_frac)
        & (s["alpha_word_frac"] >= min_alpha_word_frac)
        & (s["n_stopwords"] >= min_stopwords)
    )


def dup_line_frac(text: Column, sep: str = "\n") -> Column:
    """Fraction of a document's non-blank lines that are repeats of an
    earlier line in the SAME document (Gopher's duplicate-line signal;
    the corpus-level cut is operators/dedup.line_dedup). 0.0 for
    documents with no non-blank lines."""
    lines = F.filter(F.split(text, sep, -1), lambda x: F.trim(x) != "")
    return F.when(
        F.size(lines) > 0,
        F.round(1 - F.size(F.array_distinct(lines)) / F.size(lines), 4),
    ).otherwise(F.lit(0.0))


def compression_ratio_udf():
    """Per-doc zlib compression ratio (compressed/raw bytes) — the
    Dolma-style redundancy signal: template/boilerplate pages compress
    far below prose (~0.2 vs ~0.45), and near-random spam compresses
    poorly (→1.0). No SQL engine exposes zlib, so this is the text
    family's one legitimately-Python signal — an Arrow-batched pandas
    UDF (Iterator[Series] form, never per-row Python), pytest-gated
    rather than SQL-oracled. Empty docs → 1.0 (nothing to compress ≠
    suspicious)."""
    import zlib
    from collections.abc import Iterator as _It

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def one(t):
        if not t:
            return 1.0
        raw = t.encode("utf-8")
        return round(len(zlib.compress(raw, 6)) / len(raw), 4)

    def _ratio(batches):
        for texts in batches:
            yield texts.map(one)

    # annotations assigned explicitly (the module's string annotations
    # can't name pandas — it is imported lazily, function-locally)
    _ratio.__annotations__ = {
        "batches": _It[pd.Series], "return": _It[pd.Series],
    }
    return pandas_udf(_ratio, "double")


# ------------------------------------------------------------------ #
# C4-style line cleaning (Raffel et al. 2020 §2.2 — the public rules)
# ------------------------------------------------------------------ #

# terminal-punctuation class for the line-keep rule; frozen so the
# DuckDB oracle can mirror it byte-for-byte
C4_TERMINAL_RE = "[.!?\"']$"


def c4_kept_lines(text: Column, min_words: int = 5) -> Column:
    """``array<string>`` of the lines the C4 rules keep: ends in
    terminal punctuation, has >= ``min_words`` whitespace words, and
    does not mention 'javascript' (case-insensitive). Pure higher-order
    codegen — one projection, no shuffle. split(..., -1) keeps trailing
    empties so line counts match SQL string_split exactly."""
    return F.filter(
        F.split(text, "\n", -1),
        lambda l: l.rlike(C4_TERMINAL_RE)
        & (
            F.size(F.filter(F.split(l, " ", -1), lambda w: w != F.lit("")))
            >= F.lit(min_words)
        )
        & ~F.lower(l).contains("javascript"),
    )


def c4_clean(
    df,
    text_col: str = "text",
    min_words: int = 5,
    min_lines: int = 3,
):
    """The C4 document cleaner: drop pages containing '{' (code) or
    'lorem ipsum' (boilerplate), keep only rule-passing lines, drop
    pages with fewer than ``min_lines`` kept lines. Output replaces
    ``text_col`` with the kept lines rejoined by newline and adds
    (n_lines_kept, n_lines_orig).

    Scale shape: a single codegen projection + filter — the corpus is
    scanned once, never shuffled; at 100 TB this pipelines into
    whatever aggregation or write follows."""
    t = F.col(text_col)
    kept = c4_kept_lines(t, min_words)
    others = [c for c in df.columns if c != text_col]
    return (
        df.filter(
            ~t.contains("{") & ~F.lower(t).contains("lorem ipsum")
        )
        .select(
            *others,
            F.array_join(kept, "\n").alias(text_col),
            F.size(kept).cast("bigint").alias("n_lines_kept"),
            F.size(F.split(t, "\n", -1)).cast("bigint").alias("n_lines_orig"),
        )
        .filter(F.col("n_lines_kept") >= min_lines)
    )
