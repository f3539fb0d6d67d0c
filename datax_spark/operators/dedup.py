"""Deduplication operator family for web-scale corpora.

Exact, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine
near-dup — each as a pure DataFrame composition (no Python UDF) so the
plan stays in whole-stage codegen end to end and every shuffle is an
explicit, keyed exchange.

Portability note: default hashes are md5 hex strings (identical in Spark
SQL and DuckDB), so the driver's oracle comparison checks these operators
value-for-value, not just row counts. MinHash also takes
``hash_fn="xxhash64"`` — one JVM op per (token, seed) instead of an md5
over concatenated strings — as the production choice for real-vocabulary
corpora (Spark-only, so not oracle-comparable; differentially tested in
tests/test_dedup.py).

Scale notes (100 TB corpus):
* exact/normalized dedup — one hash-aggregate, map-side combined.
* MinHash signatures are one explode + one groupBy(doc) agg; the LSH
  band join is an equi-join on (band, bucket) — shuffle keyed on bucket,
  hot buckets split by AQE skew handling; candidate verification joins
  only within buckets, never all-pairs.
* n-gram Jaccard restricts pair generation to shared-shingle docs —
  still the classic quadratic blowup on common shingles, so callers
  bound it with ``max_shingle_freq`` (drop shingles occurring in more
  than N docs — a stopword-shingle filter that keeps the join sparse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tokens(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, token) pairs, whitespace-split, empties dropped, distinct."""
    return (
        df.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (text_md5, n_docs, keep_id)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


def normalized_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Dedup after lowercase + whitespace canonicalization."""
    canon = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " "))
    return (
        df.groupBy(F.md5(canon).alias("canon_md5"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


def minhash_signatures(
    tok: DataFrame, k: int = 8, id_col: str = "doc_id", hash_fn: str = "md5"
) -> DataFrame:
    """k-column MinHash signature per doc — one map-side-combined
    aggregate. ``hash_fn``: ``md5`` (hex strings, byte-identical in
    DuckDB — the oracle contract) or ``xxhash64`` (one JVM op per
    (token, seed), the production choice for real-vocabulary corpora
    where hashing bytes dominate)."""
    if hash_fn == "md5":
        hashes = [
            F.md5(F.concat(F.lit(f"{i}:"), F.col("tok"))) for i in range(k)
        ]
    elif hash_fn == "xxhash64":
        hashes = [F.xxhash64(F.col("tok"), F.lit(i)) for i in range(k)]
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    return tok.groupBy(id_col).agg(
        *[F.min(h).alias(f"mh{i}") for i, h in enumerate(hashes)]
    )


def band_bucket_exprs(k: int, bands: int, mh=None) -> list:
    """THE LSH bucket-string construction — "{band}:" + md5 of the
    band's comma-joined minhashes. Single definition shared by the
    one-shot pairs below, the persisted MinHashIndex, and the streaming
    near-dup operator: the three bucket byte-identically WHEN RUN WITH
    THE SAME hash_fn (the index's one-shot-equivalence contract and the
    streaming twin both compare bucket strings across implementations).
    Note the defaults differ: batch/index default to md5 (the DuckDB-
    oracle contract), streaming_near_dup defaults to xxhash64 (the
    production hash) — pass hash_fn explicitly to match across sides.
    The DuckDB oracles rebuild the md5-form strings."""
    if mh is None:
        mh = lambda i: F.col(f"mh{i}")
    rpb = k // bands
    return [
        F.concat(
            F.lit(f"{b}:"),
            F.md5(
                F.concat_ws(
                    ",", *[mh(b * rpb + r).cast("string") for r in range(rpb)]
                )
            ),
        )
        for b in range(bands)
    ]


def signatures_with_class(
    df: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-doc MinHash signature plus its class key ``_sig`` (the
    pipe-joined signature string) — the frame both the one-shot pair
    search and the incremental index build from, computed ONCE."""
    sig = minhash_signatures(tokens(df, id_col, text_col), k, id_col, hash_fn=hash_fn)
    mh = [F.col(f"mh{i}") for i in range(k)]
    return sig.withColumn("_sig", F.concat_ws("|", *[c.cast("string") for c in mh]))


def minhash_lsh_pairs(
    df: DataFrame,
    k: int = 8,
    bands: int = 4,
    jaccard_threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH banding, thresholded on the
    signature-estimated Jaccard (fraction of agreeing minhashes).

    Returns (id_a, id_b, est_jaccard) with id_a < id_b, rounded 4dp.

    This is the web-scale form (how FineWeb/SlimPajama-style pipelines
    dedup), with the decisive template-corpus optimization: docs are
    first COLLAPSED into signature classes (identical k-hash signature),
    LSH banding and the O(k) similarity test run on DISTINCT signatures
    only, and class pairs expand back to doc pairs only after the
    threshold filter. On template-heavy corpora thousands of docs share
    a signature, so the naive per-doc bucket join is quadratic in class
    size BEFORE thresholding (measured 26s at sf0.1 — it was the whole
    runtime); the collapsed plan's joins are sized by distinct
    signatures, and the only quadratic step is emitting the actual
    result pairs. Exact same output rows either way.
    """
    sig = signatures_with_class(df, k, id_col, text_col, hash_fn)
    return lsh_pairs_from_signatures(sig, k, bands, jaccard_threshold, id_col)


def lsh_pairs_from_signatures(
    sig: DataFrame,
    k: int,
    bands: int,
    jaccard_threshold: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """The pair search over a precomputed `signatures_with_class` frame
    (callers that also persist/reuse signatures — the incremental index
    — avoid signaturing the batch twice)."""
    members = sig.select("_sig", F.col(id_col))

    # ---- intra-class pairs: identical signatures, est = k/k = 1.0 ----- #
    x, y = members.alias("x"), members.alias("y")
    intra = x.join(
        y,
        (F.col("x._sig") == F.col("y._sig"))
        & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
    ).select(
        F.col(f"x.{id_col}").alias("id_a"),
        F.col(f"y.{id_col}").alias("id_b"),
        F.round(F.lit(1.0), 4).alias("est_jaccard"),
    )

    # ---- cross-class: LSH on distinct signatures ---------------------- #
    reps = sig.groupBy("_sig").agg(*[F.first(f"mh{i}").alias(f"mh{i}") for i in range(k)])
    buckets = reps.select(
        "_sig",
        F.explode(F.array(*band_bucket_exprs(k, bands))).alias("bucket"),
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._sig") < F.col("b._sig")),
        )
        .select(F.col("a._sig").alias("_sa"), F.col("b._sig").alias("_sb"))
        .distinct()
    )
    ra = reps.select(F.col("_sig").alias("_sa"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(k)])
    rb = reps.select(F.col("_sig").alias("_sb"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(k)])
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(k)
    )
    class_pairs = (
        cand.join(ra, "_sa")
        .join(rb, "_sb")
        .withColumn("est_jaccard", F.round(matches / F.lit(k), 4))
        .filter(F.col("est_jaccard") >= jaccard_threshold)  # BEFORE expansion
        .select("_sa", "_sb", "est_jaccard")
    )
    ma = members.select(F.col("_sig").alias("_sa"), F.col(id_col).alias("_ida"))
    mb = members.select(F.col("_sig").alias("_sb"), F.col(id_col).alias("_idb"))
    cross = (
        class_pairs.join(ma, "_sa")
        .join(mb, "_sb")
        .select(
            F.least("_ida", "_idb").alias("id_a"),
            F.greatest("_ida", "_idb").alias("id_b"),
            "est_jaccard",
        )
    )
    return intra.unionByName(cross)


def _verify_jaccard(
    cand: DataFrame, tok: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    sizes = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tok"))
    ta = tok.withColumnRenamed(id_col, "id_a")
    tb = tok.withColumnRenamed(id_col, "id_b")
    inter = (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "tok"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n_tok", "n_a")
    sb = sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n_tok", "n_b")
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= threshold)  # unrounded, like the SQL oracle
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
    )


def simhash16(tok: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Portable 16-bit SimHash: bit b of a token = high bit of hex nibble
    b of md5(token); per-doc bit = sign of Σ(±1). Returns (id, simhash)
    as a 16-char bitstring."""
    hexdig = F.md5(F.col("tok"))
    contribs = [
        F.when(
            F.substring(hexdig, b + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1
        )
        .otherwise(-1)
        .alias(f"c{b}")
        for b in range(16)
    ]
    per_tok = tok.select(id_col, *contribs)
    sums = per_tok.groupBy(id_col).agg(*[F.sum(f"c{b}").alias(f"s{b}") for b in range(16)])
    bits = [F.when(F.col(f"s{b}") > 0, "1").otherwise("0") for b in range(16)]
    return sums.select(id_col, F.concat(*bits).alias("simhash"))


def simhash_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Docs sharing an identical 16-bit SimHash (near-dup classes):
    (simhash, n_docs, keep_id)."""
    sh = simhash16(tokens(df, id_col, text_col), id_col)
    return sh.groupBy("simhash").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id")
    )


def simhash_hamming_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs by SimHash HAMMING distance (the real SimHash
    dedup — identical-hash classes miss hashes that differ in a bit or
    two): (id_a, id_b, hamming) with id_a < id_b, hamming ≤ max.

    Candidate generation is the pigeonhole block join Manku/Google
    dedup uses: split the 16-bit hash into 4 contiguous 4-bit blocks —
    two hashes within Hamming distance 3 MUST agree on at least one
    whole block (3 differing bits can ruin at most 3 of 4 blocks) — so
    candidates come from an equi-join on (block index, block bits),
    never all-pairs. Exact Hamming verify on candidates only. Identical
    hashes co-block everywhere and verify at 0, so this SUBSUMES the
    exact-class form. ``max_hamming`` must stay < number of blocks."""
    if max_hamming >= 4:
        raise ValueError("max_hamming must be < 4 (the block count)")
    sh = simhash16(tokens(df, id_col, text_col), id_col)
    blocks = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.array(*[
                F.concat(F.lit(f"{b}:"), F.substring("simhash", b * 4 + 1, 4))
                for b in range(4)
            ])
        ).alias("block"),
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = sum(
        F.when(
            F.substring("sh_a", i + 1, 1) != F.substring("sh_b", i + 1, 1), 1
        ).otherwise(0)
        for i in range(16)
    )
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash64(tok: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Production 64-bit SimHash (the resolution real web pipelines use —
    16 bits collides randomly past ~2^8 docs; 64 bits holds to ~2^32):
    bit b of a token = bit b of ``xxhash64(token)`` (one JVM op per
    token, vs an md5 string digest in the portable 16-bit form), per-doc
    bit = sign of Σ(±1). One map-side-combined aggregate; the signature
    returns as a BIGINT (bit 63 lands in the sign bit — it is a class
    key, not a number). Spark-only (DuckDB has no xxhash64), so
    contract coverage is rows-only — the md5 `simhash16` twin stays the
    value-checked oracle form, and determinism/locality are pytest-gated.
    """
    h = F.xxhash64(F.col("tok"))
    contribs = [
        (F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"c{b}")
        for b in range(64)
    ]
    per_tok = tok.select(id_col, *contribs)
    sums = per_tok.groupBy(id_col).agg(
        *[F.sum(f"c{b}").alias(f"s{b}") for b in range(64)]
    )
    sig = None
    for b in range(64):
        bit = F.when(F.col(f"s{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ) * F.lit(1 << b if b < 63 else -(1 << 63)).cast("long")
        sig = bit if sig is None else sig + bit
    return sums.select(id_col, sig.alias("simhash64"))


def simhash64_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Near-dup classes keyed on the 64-bit signature:
    (simhash64, n_docs, keep_id)."""
    sh = simhash64(tokens(df, id_col, text_col), id_col)
    return sh.groupBy("simhash64").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id")
    )


def word_shingles(
    df: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct word n-gram shingles per doc via array slicing — no UDF."""
    arr = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    df2 = df.select(id_col, arr.alias("toks"))
    idx = F.explode(F.sequence(F.lit(1), F.greatest(F.size("toks") - (n - 1), F.lit(0)))).alias("i")
    out = df2.select(id_col, "toks", idx)
    shingle = F.concat_ws(" ", *[F.element_at("toks", F.col("i") + j) for j in range(n)])
    return out.select(id_col, shingle.alias("shingle")).distinct()


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    jaccard_threshold: float = 0.5,
    max_shingle_freq: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs by word-n-gram Jaccard. Pair generation joins on
    shared shingles, with ultra-common shingles dropped (frequency cap)
    to keep the candidate join sparse at scale.

    The exact-verify join (all candidate pairs × full shingle sets —
    measured: ~60M intermediate rows and the whole runtime at sf0.1) is
    pruned by a count bound computed FROM the candidate join itself:
    aggregating it gives each pair's shared-RARE-shingle count r_ab, and
    the full intersection satisfies i ≤ r_ab + min(common_a, common_b)
    (shared shingles are rare-shared or common-shared). Pairs whose
    upper-bound Jaccard misses the threshold drop before any verify
    work; pairs whose docs have NO capped-out shingles need no verify at
    all (i = r_ab exactly). Only pairs that survive the bound AND touch
    common shingles — a handful — pay the exact join. Same output rows
    as the naive plan (the SQL oracle is unchanged)."""
    sh = word_shingles(df, n, id_col, text_col)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_freq"))
    sh_f = sh.join(freq, "shingle")
    sizes = sh_f.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.sum(
            F.when(F.col("df_freq") > max_shingle_freq, 1).otherwise(0)
        ).alias("n_common"),
    )
    sh_r = sh_f.filter(F.col("df_freq") <= max_shingle_freq).select(id_col, "shingle")
    a = sh_r.alias("a")
    b = sh_r.alias("b")
    rare_inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_rare_inter"))
    )
    sa = sizes.select(
        F.col(id_col).alias("id_a"), F.col("n_tok").alias("n_a"),
        F.col("n_common").alias("c_a"),
    )
    sb = sizes.select(
        F.col(id_col).alias("id_b"), F.col("n_tok").alias("n_b"),
        F.col("n_common").alias("c_b"),
    )
    bounded = rare_inter.join(sa, "id_a").join(sb, "id_b")
    i_max = F.col("n_rare_inter") + F.least(F.col("c_a"), F.col("c_b"))
    bounded = bounded.filter(
        i_max / (F.col("n_a") + F.col("n_b") - i_max) >= jaccard_threshold
    )
    exact_jac = F.col("n_rare_inter") / (
        F.col("n_a") + F.col("n_b") - F.col("n_rare_inter")
    )
    no_common = bounded.filter(F.least(F.col("c_a"), F.col("c_b")) == 0)
    exact_now = no_common.filter(exact_jac >= jaccard_threshold).select(
        "id_a", "id_b", F.round(exact_jac, 4).alias("jaccard")
    )
    leftovers = bounded.filter(F.least(F.col("c_a"), F.col("c_b")) > 0).select(
        "id_a", "id_b"
    )
    tok = sh.withColumnRenamed("shingle", "tok")
    verified = _verify_jaccard(leftovers, tok, id_col, jaccard_threshold)
    return exact_now.unionByName(verified)


def embedding_near_dup_pairs_kmeans(
    df: DataFrame,
    threshold: float = 0.9,
    n_cells: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs blocked by a TRAINED k-means cell
    (operators/similarity.train_kmeans_cells) instead of a pre-assigned
    label — the real 100 TB block key: the per-cell self-join replaces
    the all-pairs cross join, and exact near-duplicates provably share a
    cell (a scaled copy has identical centroid cosines, and the
    deterministic tie-break assigns equals identically). Pairs straddling
    a cell boundary are the recall trade-off every blocked scheme makes;
    probe-multiple-cells is the knob when it matters."""
    from datax_spark.operators.similarity import train_kmeans_cells

    cells = train_kmeans_cells(df, n_cells, n_iter, id_col, vec_col)
    tagged = df.join(cells, id_col)
    return embedding_near_dup_pairs(
        tagged, threshold, block_col="cell", id_col=id_col, vec_col=vec_col
    )


def embedding_lsh_buckets(
    df: DataFrame,
    n_planes: int = 16,
    n_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket per (vector, band) — the train-free
    block key for embedding near-dup at 100 TB (SimHash for vectors:
    Charikar, STOC'02). Plane ``p``'s pseudo-random ±1 signs come from a
    deterministic integer mix of (p, dim); the plane score sums the
    vector QUANTIZED to integers (``floor(x * 1000)``), so the sign bit
    is exact integer arithmetic — engine- and partition-order-
    independent (float summation order can flip a near-zero sign; the
    quantizer is part of the bucketing spec, and buckets only gate
    candidates — the exact cosine verify decides membership). A scaled
    copy of a vector gets identical plane scores' signs, so exact
    duplicates share every band bucket and are never missed.

    One narrow shuffle: posexplode dims → one groupBy(id) computing all
    ``n_planes`` plane scores map-side-combined; bucket ids are pure
    projection after that."""
    if n_planes % n_bands:
        raise ValueError("n_bands must divide n_planes evenly")
    per_band = n_planes // n_bands
    dims = df.select(
        F.col(id_col),
        F.posexplode(F.transform(F.col(vec_col), lambda x: x.cast("double"))),
    ).select(
        id_col,
        (F.col("pos") + 1).alias("j"),
        F.floor(F.col("col") * 1000).cast("long").alias("q"),
    )

    def sign(p: int) -> F.Column:
        # deterministic ±1 from bit 13 of a Knuth-style mix of (dim, plane)
        mixed = F.col("j") * F.lit(2654435761) + F.lit((p + 1) * 40503)
        return 1 - 2 * ((mixed / F.lit(8192)).cast("long") % 2)

    scores = dims.groupBy(id_col).agg(
        *[F.sum(F.col("q") * sign(p)).alias(f"s{p}") for p in range(n_planes)]
    )
    bands = []
    for b in range(n_bands):
        bits = None
        for i in range(per_band):
            p = b * per_band + i
            bit = F.when(F.col(f"s{p}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
            bits = bit if bits is None else bits + bit
        bands.append(
            scores.select(
                id_col,
                F.lit(b).alias("band"),
                bits.cast("long").alias("bucket"),
            )
        )
    out = bands[0]
    for extra in bands[1:]:
        out = out.unionByName(extra)
    return out


def embedding_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 16,
    n_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via random-hyperplane LSH banding:
    candidates are pairs sharing any band's bucket (equi-join on
    (band, bucket) — never all-pairs), verified by exact cosine against
    the original vectors. Train-free counterpart of
    ``embedding_near_dup_pairs_kmeans``: no quantizer fit pass, the knob
    trade-off is bands×planes (more planes/band → fewer candidates,
    more bands → higher recall); identical vectors always collide.

    ``max_bucket`` bounds the verify join on pathological cluster
    structure (the case more planes CANNOT fix: a tight cluster of
    near-identical vectors sits on the same side of every hyperplane, so
    any second-level LSH split leaves it intact and the within-bucket
    self-join goes quadratic). Buckets larger than the cap switch from
    all-pairs to a STAR: every member is compared only to the bucket's
    lowest-id representative — O(n) candidates per bucket. Semantics
    trade-off, stated plainly: in an oversized bucket, a near-dup pair
    not involving the representative is not emitted; when the oversize
    is caused by a genuine near-dup cluster (the pathology the cap
    exists for), every member pairs with the representative at
    cluster-level cosine, so the keep-lowest-id drop set is unchanged.
    The size/rep window partitions by (band, bucket) — the same key the
    candidate self-join shuffles on, so the exchange is reused."""
    buckets = embedding_lsh_buckets(df, n_planes, n_bands, id_col, vec_col)
    if max_bucket is not None:
        w = Window.partitionBy("band", "bucket")
        sized = buckets.select(
            id_col,
            "band",
            "bucket",
            F.count(F.lit(1)).over(w).alias("_n"),
            F.min(id_col).over(w).alias("_rep"),
        )
        a = sized.alias("a")
        b = sized.alias("b")
        within = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
                & (F.col("a._n") <= F.lit(max_bucket)),
            )
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
            )
        )
        star = sized.filter(
            (F.col("_n") > F.lit(max_bucket)) & (F.col(id_col) != F.col("_rep"))
        ).select(F.col("_rep").alias("id_a"), F.col(id_col).alias("id_b"))
        cand = within.unionByName(star).distinct()
    else:
        a = buckets.alias("a")
        b = buckets.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
            )
            .distinct()
        )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    dot = F.aggregate(
        F.zip_with("_va", "_vb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.col(c), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(dot / (nrm("_va") * nrm("_vb")), 4).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.99,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked on ``block_col`` so the
    self-join is per-block instead of all-pairs (at scale the block key
    is an LSH bucket or IVF cell — see
    ``embedding_near_dup_pairs_kmeans`` for the trained-cell form)."""
    a = df.alias("a")
    b = df.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda side: F.sqrt(  # noqa: E731
        F.aggregate(
            F.col(f"{side}.{vec_col}"),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )
    return (
        a.join(
            b,
            (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(dot / (norm("a") * norm("b")), 4).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def line_dedup(
    df: DataFrame,
    sep: str = "\n",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level line (paragraph) dedup, C4/CCNet-style: every line
    that occurs more than once across the corpus survives only at its
    FIRST occurrence (ordered by (doc, position) — deterministic), all
    later copies are cut out of their documents, and documents are
    reconstructed from their surviving lines. Boilerplate that repeats
    across a template site (nav text, footers, cookie banners) vanishes
    from every page but the first one crawled.

    Returns (id, text, n_lines_kept, n_lines_dropped); documents whose
    every line was dropped disappear (they contributed nothing novel).
    Whitespace-only lines are canonicalized away entirely.

    Scale shape: one shuffle keyed on the line hash (the global
    first-occurrence window — lines of one hash are colocated, so the
    window state per key is the tiny rank counter) and one groupBy(doc)
    to reassemble. Line text rides both exchanges; a hash-only ranking
    pass plus a join back would halve shuffle bytes at the cost of an
    extra join — worth it only when lines are long (the window form is
    the default because boilerplate lines are short and the join adds a
    third shuffle of the wide side).
    """
    from pyspark.sql import Window

    # per-document metadata columns (source, lang, …) ride the explode
    # and reassemble via first() — constant within a doc's group, so the
    # value is deterministic; downstream transforms keep working
    others = [c for c in df.columns if c not in (id_col, text_col)]
    lines = (
        df.select(
            F.col(id_col),
            *others,
            F.posexplode(F.split(F.col(text_col), sep, -1)).alias("pos", "line"),
        )
        .filter(F.trim(F.col("line")) != "")
    )
    w = Window.partitionBy(F.md5(F.col("line"))).orderBy(
        F.col(id_col).asc(), F.col("pos").asc()
    )
    ranked = lines.withColumn("_rn", F.row_number().over(w))
    kept = F.when(F.col("_rn") == 1, F.struct(F.col("pos"), F.col("line")))
    return (
        ranked.groupBy(id_col)
        .agg(
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(F.collect_list(kept)), lambda s: s["line"]
                ),
            ).alias(text_col),
            F.sum(F.when(F.col("_rn") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_lines_kept"),
            F.sum(F.when(F.col("_rn") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_lines_dropped"),
            *[F.first(c).alias(c) for c in others],
        )
        .filter(F.col("n_lines_kept") > 0)
    )


def intra_doc_line_dedup(
    df: DataFrame,
    sep: str = "\n",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """WITHIN-document line dedup (the in-page half of C4's rule — the
    corpus-level half is ``line_dedup``): each document keeps only the
    FIRST occurrence of every distinct line, in original order;
    whitespace-only lines are dropped. Catches pages whose template
    stamps the same nav/footer block several times into one page, which
    corpus-level dedup cannot remove (it keeps the first copy *per
    corpus*, which may be in this very document).

    Returns the input columns with ``text`` rewritten plus
    ``n_lines_kept`` / ``n_lines_dropped``.

    Scale shape: ZERO exchanges — the whole transform is per-row array
    expressions (split → filter → first-position filter → rejoin) inside
    whole-stage codegen, so it composes into any scan for free. The
    first-position test is O(L²) in the document's line count (an
    ``array_position`` probe per line) — lines per page are O(100), so
    the quadratic term is microscopic next to the string traffic.
    """
    # _lines/_kept are materialized as named columns and the outputs
    # reference those ATTRIBUTES: inlining the same lambda expression
    # tree into several projection slots miscompiles under codegen
    # subexpression elimination (the shared NamedLambdaVariables alias
    # each other — observed: size() disagreeing with array_join() over
    # the identical filter expression)
    others = [c for c in df.columns if c != text_col]
    staged = df.withColumn(
        "_lines",
        F.filter(F.split(F.col(text_col), sep, -1), lambda l: F.trim(l) != ""),
    ).withColumn(
        "_kept",
        F.filter(
            F.col("_lines"),
            lambda l, i: F.array_position(F.col("_lines"), l) == i + 1,
        ),
    )
    return staged.select(
        *others,
        F.array_join(F.col("_kept"), sep).alias(text_col),
        F.size(F.col("_kept")).cast("long").alias("n_lines_kept"),
        (F.size(F.col("_lines")) - F.size(F.col("_kept")))
        .cast("long")
        .alias("n_lines_dropped"),
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    label_rounds: int = 6,
    max_rounds: int = 50,
) -> DataFrame:
    """Near-dup CLUSTERS from a pair list: (doc_id, cluster_id) where
    cluster_id = the minimum id reachable through pair edges — the
    TRUE transitive closure, so "keep cluster_id, drop the rest" is
    the transitive-closure version of the pairwise keep-lowest-id rule
    (pairwise drops under-delete: b dropped for a does not drop c
    paired only with b).

    Hybrid, convergence-checked (round 4 — earlier revisions ran
    min-label propagation with a FIXED 4-round budget, silently
    splitting any component whose min-id node is >4 hops from a
    member: an at-scale correctness hazard for chain-shaped near-dup
    graphs, and for leakage-safe splits precisely the failure the
    operator promises to prevent):

    1. Up to ``label_rounds`` rounds of min-label propagation — ONE
       equi-join + one groupBy per round, fixpoint detected by a
       (count, Σ xxhash64(node,label)) checksum over the labels frame
       (labels only decrease, so an unchanged checksum IS the
       fixpoint). Near-dup graphs are star-ish (template clusters,
       diameter ≲ 3), so this almost always exits here, cheaper per
       round than star contraction.
    2. If still unconverged (adversarial chains), contract every node
       to its current label and finish with the convergence-checked
       large-star/small-star contraction (:func:`datax_spark.operators.
       graph.connected_components`, O(log² n) rounds on any topology)
       on the QUOTIENT graph — connectivity is preserved under
       quotient by labels (label(u) is a node of u's component), the
       quotient is already k-hop-contracted so it is much smaller, and
       the component minimum survives because the min node labels
       itself. Composition is one small join.

    ``localCheckpoint`` per round cuts the iterative lineage (the same
    driver-OOM guard the graph loop uses).
    """
    from datax_spark.operators import graph as G

    a = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    b = pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    edges = a.union(b).distinct().localCheckpoint(eager=True)
    nodes = edges.select("src").distinct()
    labels = nodes.select("src", F.col("src").alias("label"))
    self_loop = nodes.select("src", F.col("src").alias("dst"))
    prop_edges = edges.union(self_loop)

    def _checksum(lbl: DataFrame):
        row = lbl.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("src", "label").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    prev = _checksum(labels)
    converged = False
    for _ in range(max(label_rounds, 0)):
        labels = (
            prop_edges.join(labels.withColumnRenamed("src", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        cur = _checksum(labels)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        lu = labels.withColumnRenamed("src", "u_src").withColumnRenamed(
            "label", "u_label"
        )
        lv = labels.withColumnRenamed("src", "v_src").withColumnRenamed(
            "label", "v_label"
        )
        quotient = (
            edges.join(lu, edges["src"] == lu["u_src"])
            .join(lv, edges["dst"] == lv["v_src"])
            .select(
                F.col("u_label").alias("src"), F.col("v_label").alias("dst")
            )
            .filter(F.col("src") != F.col("dst"))
        )
        comp = G.connected_components(
            quotient, max_rounds=max_rounds
        ).withColumnRenamed("node", "label")
        labels = labels.join(comp, "label", "left").select(
            "src", F.coalesce("component", "label").alias("label")
        )
    return labels.select(
        F.col("src").alias("doc_id"), F.col("label").alias("cluster_id")
    )
