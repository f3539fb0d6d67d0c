"""Distributed BPE tokenizer training — the byte-pair-encoding loop
(Sennrich et al. 2016, the construction behind GPT/Llama tokenizers)
expressed Spark-first.

Training never iterates over the corpus: the corpus is read ONCE into a
word-frequency table (one map-side-combined groupBy — distinct words,
not tokens, so ~10^7 rows even at 100 TB), and every merge iteration is
two narrow jobs over that small table:

    1. adjacent-pair counts: explode (symbol_i, symbol_i+1) weighted by
       word count → groupBy pair → argmax (deterministic tie-break on
       (count desc, left asc, right asc) so training is reproducible);
    2. apply the merge: a per-row greedy left-to-right fold over each
       word's symbol array (pure codegen ``aggregate`` expression — no
       UDF in the loop).

The driver collects ONE row per iteration (the winning pair) — that is
the algorithm's inherent sync point, not a scalability leak.

Encoding with a trained merge list is sequential per token (each merge
rewrites the symbol array), so ``encode_bpe`` runs as an Arrow
``mapInPandas`` batch — the vectorized-UDF path, never per-row Python.

Differential-tested against a pure-python reference trainer
(tests/test_bpe.py); board entry ``bpe_merges`` is rows-only (the loop
is iterative — not SQL-expressible, SURVEY §2.9 note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

END = "</w>"  # end-of-word marker (standard BPE: distinguishes suffixes)


def word_freq_table(
    df: DataFrame, text_col: str = "text", min_freq: int = 1
) -> DataFrame:
    """(word, count) — the ONLY pass over the corpus."""
    out = (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), "\\s+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    if min_freq > 1:
        out = out.filter(F.col("count") >= min_freq)
    return out


def _initial_symbols(words: DataFrame) -> DataFrame:
    """word → its character symbol array + END marker."""
    return words.select(
        "count",
        F.concat(
            F.split(F.col("w"), ""), F.array(F.lit(END))
        ).alias("s"),
    )


def _merge_expr(col, left: str, right: str):
    """Greedy left-to-right merge of adjacent (left, right) → left+right
    inside a symbol array — one codegen ``aggregate`` fold, no UDF."""
    l, r = F.lit(left), F.lit(right)
    return F.aggregate(
        col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == l)
            & (x == r),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(l, r)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    df: DataFrame,
    n_merges: int = 32,
    text_col: str = "text",
    min_freq: int = 1,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """The ordered merge list (the tokenizer model). Stops early when no
    adjacent pair reaches ``min_pair_count``."""
    syms = _initial_symbols(word_freq_table(df, text_col, min_freq))
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        # checkpoint the lineage: each merge nests an aggregate() over
        # the previous array — persist keeps the plan shallow
        syms = syms.persist()
        pair = F.arrays_zip(
            F.slice(F.col("s"), 1, F.size("s") - 1),
            F.slice(F.col("s"), 2, F.size("s") - 1),
        )
        top = (
            syms.filter(F.size("s") >= 2)
            .select("count", F.explode(pair).alias("p"))
            .select(
                F.col("p")["0"].alias("l"), F.col("p")["1"].alias("r"), "count"
            )
            .groupBy("l", "r")
            .agg(F.sum("count").alias("n"))
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_pair_count:
            break
        l, r = top[0]["l"], top[0]["r"]
        merges.append((l, r))
        prev = syms
        syms = syms.select("count", _merge_expr(F.col("s"), l, r).alias("s"))
        # materialize THEN unpersist the parent (unpersisting first
        # would recompute the whole chain)
        syms = syms.persist()
        syms.count()
        prev.unpersist()
    syms.unpersist()
    return merges


def merges_table(spark: SparkSession, merges: list[tuple[str, str]]) -> DataFrame:
    """The trained model as a DataFrame (rank, left, right, token) —
    what ships to the encoder and the contract board."""
    return spark.createDataFrame(
        [(i, l, r, l + r) for i, (l, r) in enumerate(merges)],
        "rank int, left string, right string, token string",
    )


def encode_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, tokens array<string>, n_tokens) — apply the merge list in
    rank order to every word. Arrow-batched mapInPandas (the merge loop
    is sequential per word; vectorized across the batch)."""
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("tokens", T.ArrayType(T.StringType())),
            T.StructField("n_tokens", T.LongType()),
        ]
    )

    def _encode_word(word: str, cache: dict) -> list[str]:
        got = cache.get(word)
        if got is not None:
            return got
        s = list(word) + [END]
        while len(s) >= 2:
            best, best_rank = None, None
            for i in range(len(s) - 1):
                rk = ranks.get((s[i], s[i + 1]))
                if rk is not None and (best_rank is None or rk < best_rank):
                    best, best_rank = i, rk
            if best is None:
                break
            # merge ALL occurrences of the best-ranked pair, greedy L→R
            l, r = s[best], s[best + 1]
            t, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    t.append(l + r)
                    i += 2
                else:
                    t.append(s[i])
                    i += 1
            s = t
        cache[word] = s
        return s

    def _fn(it):
        cache: dict = {}
        for pdf in it:
            toks = [
                [
                    t
                    for w in str(txt).lower().split()
                    for t in _encode_word(w, cache)
                ]
                if txt is not None
                else []
                for txt in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "tokens": toks,
                    "n_tokens": [len(t) for t in toks],
                }
            )

    return df.select(id_col, text_col).mapInPandas(_fn, schema)
