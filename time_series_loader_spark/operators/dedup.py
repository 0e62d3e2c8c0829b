"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash,
embedding-cosine near-dup.

Beyond-reference capability (BASELINE.json north star). Design notes for
100 TB:

- **exact**: one hash-groupBy on a digest of the dedup key columns — the
  cheapest possible shuffle (digest + id only, not full rows).
- **n-gram Jaccard (exact)**: explode distinct shingles → self-equi-join on
  the shingle → per-pair intersection counts. Quadratic in docs *per
  shingle bucket*; correct but only for candidate verification or small
  corpora. The scale path is MinHash-LSH below.
- **MinHash-LSH**: k min-wise hashes per doc computed with map-side partial
  aggregation (explode shingles → k narrow min() aggs), then b bands →
  explode(b) → self-join on (band_id, band_key). Only docs sharing a band
  collide, so the join is linear-ish in practice. Estimated Jaccard =
  fraction of equal minhashes.
- Min-wise hash family (r10): ONE md5 per shingle → 48-bit integer of
  its first 12 hex chars mod P=2³¹−1 → k Carter–Wegman variants
  (A_i·h+B_i) mod P with frozen coefficients (:func:`minhash_params`) —
  the textbook Broder construction, BIGINT signatures, bit-identical in
  any engine via plain integer arithmetic over the same md5.
- **embedding near-dup**: cosine over DECIMAL-exact dot products (see
  similarity.py) with a threshold.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from time_series_loader_spark.operators.text import tokens


def dedup_exact(
    df: DataFrame, key_cols: Sequence[str], id_col: str
) -> DataFrame:
    """Exact dedup: one representative (min id) per distinct key, with the
    duplicate count. ``keep_representatives`` semantics of the 100 TB
    pipeline: join the result back on ``id_col`` to filter the corpus."""
    digest = F.md5(F.concat_ws("\x01", *[F.coalesce(F.col(c).cast("string"), F.lit(" ")) for c in key_cols]))
    return (
        df.select(digest.alias("key_digest"), F.col(id_col))
        .groupBy("key_digest")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_dups"))
    )


def _shingles_of(t: Column, n: int) -> Column:
    """Distinct word n-grams of a token ARRAY column.

    Linear construction: zip n shifted views of the array
    (``slice(t, i, m)`` for i = 1..n) with string concatenation — O(tokens)
    work per row. The naive form (``transform(sequence(...), i ->
    concat_ws(slice(t, i, n)))``) re-evaluates the tokenization expression
    inside the lambda for every shingle, going quadratic per doc — but
    ONLY when ``t`` is an inline expression; over a MATERIALIZED token
    attribute the transform form just slices and measured 2× faster than
    this chain (see ``decontam.contamination_expr``). Use this form when
    tokens are inline, the transform form when they're a column.
    """
    m = F.size(t) - (n - 1)
    acc = F.slice(t, n, m)
    for i in range(n - 1, 0, -1):
        part = F.slice(t, i, m)
        acc = F.zip_with(part, acc, lambda a, b: F.concat_ws(" ", a, b))
    return F.when(m >= 1, F.array_distinct(acc)).otherwise(
        F.array().cast("array<string>")
    )


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the whitespace-token stream."""
    return _shingles_of(tokens(text), n)


def shingle_arrays(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    min_parallelism: int | None = None,
) -> DataFrame:
    """(id, sorted distinct shingle array, size) per doc with text.

    Computed as a per-ROW Arrow kernel (``mapInPandas``) — zero shuffle.
    The expression alternative (tokens → n× zip_with concat →
    array_distinct → array_sort) is pure-JVM but every step is an
    interpreted higher-order function over ~tokens elements; the Python
    set-build measured ~10× faster at 5k docs × 50 tokens and the gap
    widens with doc length. Same token rule as :func:`tokens`
    (lower, trim, split on Java ``\\s+``).

    ``min_parallelism``: opt-in round-robin fan-out when the source
    yields fewer partitions. The kernel AND everything narrow above it
    (explode, per-shingle hashing, map-side partial aggregation) inherit
    the input's partitioning — a single-file source serializes all of it
    on one core regardless of cluster size (see ``text.text_profile``).
    Default None: never reshuffle an already well-partitioned corpus.
    """
    if min_parallelism and df.rdd.getNumPartitions() < min_parallelism:
        df = df.repartition(min_parallelism)
    import re

    import pandas as pd
    from pyspark.sql.types import ArrayType, IntegerType, StringType, StructField, StructType

    out_schema = StructType(
        [
            df.schema[id_col],
            StructField("_arr", ArrayType(StringType())),
            StructField("_sz", IntegerType()),
        ]
    )
    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def kernel(batches):
        for pdf in batches:
            ids, arrs, szs = [], [], []
            for i, s in zip(pdf[id_col], pdf[text_col]):
                if s is None:
                    continue
                toks = ws.split(s.strip().lower())
                sh = sorted({" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)})
                ids.append(i)
                arrs.append(sh)
                szs.append(len(sh))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                    # explicit object dtype: an EMPTY list otherwise becomes
                    # a float64 column, which Arrow cannot convert to
                    # list<string> (all-null or sparse partitions hit this)
                    "_arr": pd.Series(arrs, dtype="object"),
                    "_sz": pd.Series(szs, dtype="int32"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(kernel, out_schema)


def shingle_table(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    min_parallelism: int | None = None,
) -> DataFrame:
    """(id, shingle) long table — distinct shingles per doc (Arrow kernel
    + explode; see :func:`shingle_arrays`, incl. ``min_parallelism``)."""
    return shingle_arrays(df, text_col, id_col, n, min_parallelism).select(
        F.col(id_col), F.explode("_arr").alias("shingle")
    )


def resolve_max_df(
    max_df: int | str | None, df: DataFrame, n_docs: int | None = None
) -> int | None:
    """Resolve the stop-shingle cutoff. ``"auto"`` → ``max(1000, 0.1%·N)``
    where N is the corpus row count: an absolute default (the old flat
    100k) is meaningless across corpus scales — at 10¹⁰ docs a shingle in
    99,999 docs is boilerplate that detonates the self-join (max_df²
    candidate rows per shingle), while at 10⁵ docs the same flat cutoff
    never engages. The relative form keeps worst-case fan-out at
    (0.001·N)² only for shingles that are genuinely corpus-boilerplate.

    NOTE the default-change footgun for callers migrating from a flat
    cutoff: under 1M docs the effective cutoff drops to 1000, so pairs
    whose ONLY common shingles sit in >1000 docs (pure boilerplate
    overlap) are no longer reported. Pass an explicit int to restore the
    old behavior.

    ``n_docs``: precomputed corpus count. ``df.count()`` is
    metadata-cheap over a parquet scan but a FULL plan execution when
    ``df`` is a derived frame (post-scrub, post-filter) — callers that
    already know N (or chain after an agg that produced it) should pass
    it rather than paying the plan twice.
    """
    if max_df == "auto":
        return max(1000, int(0.001 * (df.count() if n_docs is None else n_docs)))
    return max_df  # int or None (explicitly unbounded)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | str | None = "auto",
    n_docs: int | None = None,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing ≥1 indexed shingle.

    Returns (id_a, id_b, n_common, jaccard) with id_a < id_b and
    jaccard ≥ threshold. Jaccard computed from exact integer counts
    (|A∩B| / (|A| + |B| - |A∩B|)) — deterministic.

    Join shape: inverted-index self-join on the shingle → per-pair count.
    Right default when shingle document-frequencies are flat (every shared
    shingle is a near-certain candidate anyway). For Zipfian corpora where
    prefixes prune hard, use :func:`ngram_jaccard_pairs_prefix`.

    ``max_df`` is the stop-shingle cutoff that keeps the self-join from
    detonating on hot shingles (a shingle in m docs contributes m²/2
    candidate rows): shingles whose document frequency exceeds it are
    dropped from the inverted index, so the join fans out at most
    max_df² per shingle. Default ``"auto"`` = ``max(1000, 0.1%·N)`` (see
    :func:`resolve_max_df`) so the bound tracks corpus scale instead of
    an absolute doc count. Reported ``n_common``/``jaccard`` stay EXACT —
    each doc's (few) hot shingles ride along as a small sorted array and
    the per-pair hot intersection is added back to the cold count. The
    one loss mode: a pair whose EVERY common shingle is hotter than
    max_df is never generated (standard trade; such pairs share only
    boilerplate). ``None`` disables the cutoff entirely.

    Storage: NOTHING here is cached. The exploded shingle table is
    strictly larger than the input corpus — at the 100 TB design point a
    ``cache()`` (MEMORY_AND_DISK) would materialize >100 TB to executor
    local disks and pin it in the session cache until unpersist/GC.
    Instead every consumer (document-frequency window, size agg, hot-set
    agg, AND the self-join) hangs off ONE window exchange hash-partitioned
    by shingle: Spark's ReusedExchange (spark.sql.exchange.reuse, on by
    default) writes that shuffle once and the Arrow shingle kernel runs
    exactly once, with per-consumer cost limited to re-reading shuffle
    files — bounded by shuffle-spill capacity that the join needs anyway,
    never by the cache store.
    """
    max_df = resolve_max_df(max_df, df, n_docs=n_docs)
    sh = shingle_table(df, text_col, id_col, n, min_parallelism)

    # Document frequency via a window over PARTITION BY shingle — the
    # exact shuffle the self-join below needs anyway, so Spark reuses
    # one exchange for df computation, index pruning, per-doc sizes, AND
    # the join (a separate groupBy + anti-join costed an extra agg pass
    # and join stage that benchmarked ~1.6× the whole query). Hot
    # postings are few per doc (df > cutoff bounds distinct hot
    # shingles by total_postings/max_df) so each doc's hot set
    # collapses to one small sorted array. The window is applied even
    # when max_df is None so the size agg and the join still share the
    # one exchange instead of re-running the kernel per consumer.
    shd = sh.withColumn(
        "_df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
    )
    # sizes include hot shingles: |S| counts ALL distinct shingles
    sizes = shd.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))

    if max_df is None:
        idx = shd.select(id_col, "shingle")
        hot_common = F.lit(0).cast("long")
        join_hot = lambda d: d  # noqa: E731
    else:
        idx = shd.where(F.col("_df") <= max_df).select(id_col, "shingle")
        hot_per_doc = (
            shd.where(F.col("_df") > max_df)
            .groupBy(id_col)
            .agg(F.sort_array(F.collect_set("shingle")).alias("_hot"))
        )
        empty = F.array().cast("array<string>")
        ha = hot_per_doc.select(F.col(id_col).alias("id_a"), F.col("_hot").alias("_hot_a"))
        hb = hot_per_doc.select(F.col(id_col).alias("id_b"), F.col("_hot").alias("_hot_b"))
        hot_common = F.size(
            F.array_intersect(
                F.coalesce(F.col("_hot_a"), empty), F.coalesce(F.col("_hot_b"), empty)
            )
        ).cast("long")
        join_hot = lambda d: d.join(ha, "id_a", "left").join(hb, "id_b", "left")  # noqa: E731

    a = idx.select(F.col(id_col).alias("id_a"), "shingle")
    b = idx.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_n_cold"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    jac = F.col("n_common") / (F.col("sz_a") + F.col("sz_b") - F.col("n_common"))
    return (
        join_hot(inter)
        .withColumn("n_common", (F.col("_n_cold") + hot_common).cast("long"))
        .join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .select("id_a", "id_b", "n_common", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard via PPJoin-style prefix filtering.

    Identical output to :func:`ngram_jaccard_pairs` (exact, no recall
    loss), different join shape: with shingle sets canonically sorted, two
    sets with J ≥ t must share an element within each set's first
    ``|S| - ceil(t·|S|) + 1`` shingles, and must satisfy
    ``t·|A| ≤ |B| ≤ |A|/t`` (length filter). The inverted index covers
    PREFIXES only and survivors are verified with one ``array_intersect``
    per DISTINCT candidate pair. Wins when shingle document-frequencies
    are Zipfian (real corpora): rare-first prefixes make candidates
    near-linear. On flat-frequency corpora the prune doesn't bite and the
    plain inverted-index join is faster.
    """
    t = float(threshold)
    arrays = shingle_arrays(df, text_col, id_col, n).where(F.col("_sz") >= 1)
    prefix_len = (F.col("_sz") - F.ceil(F.lit(t) * F.col("_sz")) + 1).cast("int")
    prefix = arrays.select(
        F.col(id_col),
        F.col("_sz"),
        F.explode(F.slice("_arr", 1, prefix_len)).alias("shingle"),
    )
    a = prefix.select(F.col(id_col).alias("id_a"), F.col("_sz").alias("_sza"), "shingle")
    b = prefix.select(F.col(id_col).alias("id_b"), F.col("_sz").alias("_szb"), "shingle")
    cand = (
        a.join(b, "shingle")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.lit(t) * F.col("_sza") <= F.col("_szb"))
            & (F.lit(t) * F.col("_szb") <= F.col("_sza"))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    va = arrays.select(
        F.col(id_col).alias("id_a"), F.col("_arr").alias("_aa"), F.col("_sz").alias("sz_a")
    )
    vb = arrays.select(
        F.col(id_col).alias("id_b"), F.col("_arr").alias("_ab"), F.col("_sz").alias("sz_b")
    )
    # cast matches the count()-based path's BIGINT (driver hashing is
    # type-sensitive — see the DuckDB HUGEINT lesson on sessionize)
    n_common = F.size(F.array_intersect("_aa", "_ab")).cast("long")
    jac = F.col("n_common") / (F.col("sz_a") + F.col("sz_b") - F.col("n_common"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", n_common.alias("n_common"), "sz_a", "sz_b")
        .select("id_a", "id_b", "n_common", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


MINHASH_P = 2_147_483_647  # 2^31 − 1, prime — the universal-hash modulus


def minhash_params(num_hashes: int) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """Deterministic (A, B) coefficients for the k universal hash
    functions h_i(x) = (A_i·x + B_i) mod P — generated by a fixed PCG
    multiplier LCG (pure integer arithmetic, no library RNG, so the
    stream is stable by construction on every platform and replayable
    inside the DuckDB oracle builders, which import these exact
    tuples). A_i ∈ [1, P−1] (P prime ⇒ every A_i is invertible mod P,
    the textbook Carter–Wegman family), B_i ∈ [0, P−1]."""
    x = 0x853C49E6748FEA9B
    a_s, b_s = [], []
    for _ in range(num_hashes):
        x = (6364136223846793005 * x + 1442695040888963407) % (1 << 64)
        a_s.append(x % (MINHASH_P - 1) + 1)
        x = (6364136223846793005 * x + 1442695040888963407) % (1 << 64)
        b_s.append(x % MINHASH_P)
    return tuple(a_s), tuple(b_s)


def minhash_shingle_hash(shingle: Column) -> Column:
    """The ONE strong hash per shingle the k-variant family is built
    on: integer value of the first 12 hex chars of md5(shingle)
    (48 bits), reduced mod P. Engine-replayable: DuckDB computes the
    identical value by per-hex-digit arithmetic over the same md5."""
    return (
        F.conv(F.substring(F.md5(shingle), 1, 12), 16, 10).cast("long")
        % MINHASH_P
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 16,
    min_parallelism: int | None = None,
) -> DataFrame:
    """k min-wise hashes per doc (BIGINT):
    mh_i = min over shingles of (A_i·H(shingle) + B_i) mod P, with ONE
    md5 per shingle (Broder 1997 via a Carter–Wegman universal family —
    the standard MinHash construction, e.g. Spark MLlib's MinHashLSH).

    r10 change of construction: the previous form hashed every shingle
    k times (min(md5(i ':' shingle)) per i) — 16× the md5 work, which a
    100×-probe decomposition showed DOMINATING the whole LSH slot (the
    signature stage alone was ~20 s of the 15-21 s total at 500k docs;
    md5 is ~0.4 µs/call and 26.5M shingles × 16 calls is 170 CPU-s).
    One md5 + k integer multiply-adds keeps the k-independent-hash
    semantics at 1/16th the hash cost, and the shuffle carries k
    8-byte longs per doc instead of k 32-byte hex strings.

    One explode + one groupBy with k narrow min() aggregates — partial
    aggregation happens map-side, so the shuffle stays k values per doc
    regardless of doc length. The per-shingle md5 happens BEFORE the
    exchange, so it parallelizes only as far as the input partitioning —
    ``min_parallelism`` (see :func:`shingle_arrays`) is the opt-in
    fan-out for single-file sources.
    """
    sh = shingle_table(df, text_col, id_col, n, min_parallelism)
    a_s, b_s = minhash_params(num_hashes)
    hashed = sh.select(
        F.col(id_col), minhash_shingle_hash(F.col("shingle")).alias("_hm")
    )
    mins = [
        F.min((F.lit(a_s[i]) * F.col("_hm") + F.lit(b_s[i])) % MINHASH_P).alias(
            f"mh{i}"
        )
        for i in range(num_hashes)
    ]
    return hashed.groupBy(id_col).agg(*mins)


def _band_key_entries(num_hashes: int, bands: int, prefix: str = "mh") -> Column:
    """array<struct<band_id,band_key>> over ``prefix{i}`` signature columns:
    band b's key = md5 of its ``num_hashes/bands`` minhashes joined with
    '|'. Shared by :func:`minhash_lsh_pairs` (pair mining) and
    :func:`incremental_dedup` (batch-vs-store probe) so both sides of an
    incremental join derive bit-identical keys from stored signatures."""
    rows_per_band = num_hashes // bands
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            # explicit decimal-string cast: the BIGINT
                            # minhashes must render identically in the
                            # oracle's `mh0 || '|' || mh1` coercion
                            F.col(f"{prefix}{b * rows_per_band + r}").cast(
                                "string"
                            )
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    min_parallelism: int | None = None,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs.

    banding: ``bands`` bands of ``num_hashes/bands`` rows; docs sharing any
    band key become candidates; estimated Jaccard = fraction of equal
    minhashes; pairs below ``threshold`` dropped. Returns
    (id_a, id_b, est_jaccard), id_a < id_b.

    Single-consumer shape: the full signature RIDES the band explode, so
    the band self-join delivers both sides' minhashes and the estimate is
    computed on the joined row directly — no candidate `distinct` +
    signature re-joins, and the signature frame (kernel + groupBy) is
    consumed exactly once. The r4 form cached the signatures and
    re-joined them twice after a distinct; the r5 no-cache rule made that
    re-execution visible (2.9 s vs 1.0 s at sf0.1), and carrying the
    k BIGINT hashes through the explode (k·8 B · bands per doc of shuffle)
    is cheaper than either caching or recomputing: the pair-level
    ``est_jaccard`` is deterministic, so ``distinct`` on
    (id_a, id_b, est) AFTER scoring dedups multi-band collisions exactly
    as the candidate-distinct did.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    sig = minhash_signatures(df, text_col, id_col, n, num_hashes, min_parallelism)

    band_entries = _band_key_entries(num_hashes, bands)
    banded = sig.select(
        F.col(id_col), F.explode(band_entries).alias("e"), *[F.col(f"mh{i}") for i in range(num_hashes)]
    ).select(
        id_col,
        F.col("e.band_id").alias("band_id"),
        F.col("e.band_key").alias("band_key"),
        *[F.col(f"mh{i}") for i in range(num_hashes)],
    )
    a = banded.select(
        F.col(id_col).alias("id_a"),
        "band_id",
        "band_key",
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(num_hashes)],
    )
    b = banded.select(
        F.col(id_col).alias("id_b"),
        "band_id",
        "band_key",
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(num_hashes)],
    )
    eq = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(num_hashes)
    )
    est = eq.cast("double") / float(num_hashes)
    return (
        a.join(b, ["band_id", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", est.alias("est_jaccard"))
        .distinct()
        .where(F.col("est_jaccard") >= threshold)
    )


def near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    candidate_threshold: float = 0.0,
    verify: bool = True,
    min_parallelism: int | None = None,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """The packaged 100 TB near-dup path (VERDICT r10 directive #2):
    MinHash-LSH as the approximate PREFILTER, exact n-gram Jaccard as
    the VERIFIER, computed only on LSH candidates.

    SCALING.md's r10 measurement showed both exact forms
    (:func:`ngram_jaccard_pairs`, :func:`ngram_jaccard_pairs_prefix`)
    are inherently candidate-bound on dense corpora (12.6× wall at the
    100× probe — every doc pair sharing ≥1 shingle must be scored),
    while LSH's band join scales at ~3.3× — but returns ESTIMATED
    Jaccard. This composition returns TRUE Jaccard at LSH cost:

    1. candidates = band-colliding pairs with ``est_jaccard ≥
       candidate_threshold`` (default 0.0 — banding alone prunes; a
       higher value trades recall for fewer verifications);
    2. only documents APPEARING in a candidate pair are re-shingled
       (semi-join pushdown — at realistic dup rates that is a small
       fraction of the corpus, so verification cost tracks the
       candidate set, not corpus size);
    3. exact |A∩B| via ``array_intersect`` on the two shingle arrays;
       pairs below ``threshold`` (on the EXACT score) are dropped.

    Returns (id_a, id_b, est_jaccard, n_common, jaccard), id_a < id_b.
    Recall contract: identical to LSH recall — a true near-dup pair
    colliding in no band is missed (tune bands/num_hashes); every pair
    REPORTED carries its exact score, so precision is 1.0 w.r.t. the
    threshold. ``verify=False`` degrades to :func:`minhash_lsh_pairs`
    (``threshold`` applies to the estimate; the exact-score columns are
    absent).

    Candidate pairs are ``localCheckpoint``-materialized (output-sized
    — the same contract as `incremental_dedup`'s hit set): the id
    semi-join and the verification join both consume them, and without
    the checkpoint each consumer would re-run the whole LSH pipeline.
    The candidate docs' shingle arrays are NOT materialized — the
    kernel runs once per verification side (twice total) over the
    candidate-doc subset, which stays cheaper than pinning a
    corpus-shaped frame to executor disk (the no-corpus-sized-cache
    house rule; SCALING.md 'Global posture').

    ``candidates``: optionally reuse an ALREADY-MATERIALIZED candidate
    frame ((id_a, id_b, est_jaccard) — normally a checkpointed
    :func:`minhash_lsh_pairs` result the caller also consumes for
    another purpose, e.g. the gate slot's clustering section);
    ``candidate_threshold`` is then the caller's responsibility.

    The dedup ACTION composes directly (verified-score clusters):
    ``graph.keep_representatives(df, near_dup_pairs(df, tc, ic), ic)``
    keeps one representative (min id) per EXACT-Jaccard cluster —
    pinned by ``test_near_dup_pairs_keep_representatives_composition``.
    """
    if not verify:
        return minhash_lsh_pairs(
            df, text_col, id_col, n, num_hashes, bands, threshold,
            min_parallelism,
        )
    cand = (
        candidates
        if candidates is not None
        else minhash_lsh_pairs(
            df, text_col, id_col, n, num_hashes, bands,
            threshold=candidate_threshold, min_parallelism=min_parallelism,
        # lazy (r14): both consumers run inside one action — the blocks
        # materialize once in that job, no dedicated checkpoint job
        ).localCheckpoint(eager=False)
    )
    ids = (
        cand.select(F.col("id_a").alias("_vid"))
        .union(cand.select("id_b"))
        .distinct()
    )
    needed = df.join(ids, F.col(id_col) == F.col("_vid"), "left_semi")
    arrays = shingle_arrays(needed, text_col, id_col, n, min_parallelism)
    va = arrays.select(
        F.col(id_col).alias("id_a"),
        F.col("_arr").alias("_aa"),
        F.col("_sz").alias("sz_a"),
    )
    vb = arrays.select(
        F.col(id_col).alias("id_b"),
        F.col("_arr").alias("_ab"),
        F.col("_sz").alias("sz_b"),
    )
    # BIGINT n_common to match the exact paths (driver hashing is
    # type-sensitive — the DuckDB HUGEINT lesson)
    n_common = F.size(F.array_intersect("_aa", "_ab")).cast("long")
    jac = F.col("n_common") / (F.col("sz_a") + F.col("sz_b") - F.col("n_common"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", "est_jaccard", n_common.alias("n_common"), "sz_a", "sz_b")
        .select("id_a", "id_b", "est_jaccard", "n_common", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def lsh_collision_probability(
    jaccard: float, num_hashes: int = 16, bands: int = 4
) -> float:
    """Probability that a pair with true Jaccard ``jaccard`` collides in
    at least one LSH band: ``1 − (1 − j^r)^b`` with ``r = num_hashes /
    bands`` rows per band (the standard banding S-curve, e.g. Leskovec/
    Rajaraman/Ullman, Mining of Massive Datasets ch. 3). This is the
    RECALL of :func:`minhash_lsh_pairs` / :func:`near_dup_pairs` at a
    given true similarity — the quantitative form of the 'LSH recall'
    contract their docstrings reference. Driver-side math for tuning;
    nothing engine-side depends on it."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    return 1.0 - (1.0 - jaccard**r) ** bands


def lsh_threshold_midpoint(num_hashes: int = 16, bands: int = 4) -> float:
    """The banding S-curve's characteristic point ``(1/b)^(1/r)`` — the
    true Jaccard where each band collides with probability exactly
    ``1/b``, i.e. where the curve is STEEPEST, not where it crosses 0.5
    (collision probability there is ``1 − (1 − 1/b)^b`` ≈ 0.68 for
    b=4, → 1−1/e ≈ 0.63 as b grows). Choose (num_hashes, bands) so
    this sits AT OR BELOW the dedup threshold: pairs above the
    threshold then collide with probability ≥ ~0.68, rising steeply
    (at the default 16/4: midpoint 0.71, recall per
    :func:`lsh_collision_probability` = 0.78 at j=0.75, 0.986 at
    j=0.9, 0.999998 at j=0.99 — near-exact dups are near-certainly
    caught, borderline pairs are the documented trade).
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    return (1.0 / bands) ** (1.0 / r)


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    n_bits: int = 32,
    min_parallelism: int | None = None,
) -> DataFrame:
    """SimHash near-dup: pairs whose n-bit simhash differs in ≤ k bits.
    ``min_parallelism`` forwards to the signature kernel (fan-out for
    single-file inputs; see ``text.simhash_bits``).

    Scale path: split the signature into k+1 contiguous blocks — a pair
    within Hamming ≤ k must agree EXACTLY on at least one block
    (pigeonhole: k mismatches can dirty at most k of the k+1 blocks) — and
    self-join on the block key, never all-pairs. Wider signatures (32+)
    keep blocks ≥ 8 bits so block buckets stay selective on large corpora.
    """
    from time_series_loader_spark.operators.text import hamming_bits, simhash_bits

    n_blocks = max_hamming + 1
    if n_blocks > n_bits:
        raise ValueError("max_hamming must be < n_bits")
    # contiguous block boundaries, as even as possible
    bounds = [round(i * n_bits / n_blocks) for i in range(n_blocks + 1)]

    sig = simhash_bits(df, text_col, id_col, n_bits, min_parallelism=min_parallelism)
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("block_id"),
                F.substring("simhash", bounds[i] + 1, bounds[i + 1] - bounds[i]).alias(
                    "block"
                ),
            )
            for i in range(n_blocks)
        ]
    )
    # integer form of the signature: hamming = bit_count(a XOR b) — one JVM
    # instruction pair per candidate instead of n substring compares
    sig = sig.withColumn("sig_int", F.conv("simhash", 2, 10).cast("bigint"))
    exploded = sig.select(F.col(id_col), F.col("sig_int"), F.explode(blocks).alias("e")).select(
        id_col,
        "sig_int",
        F.col("e.block_id").alias("block_id"),
        F.col("e.block").alias("block"),
    )
    a = exploded.select(
        F.col(id_col).alias("id_a"), F.col("sig_int").alias("int_a"), "block_id", "block"
    )
    b = exploded.select(
        F.col(id_col).alias("id_b"), F.col("sig_int").alias("int_b"), "block_id", "block"
    )
    cand = (
        a.join(b, ["block_id", "block"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "int_a", "int_b")
        .distinct()
    )
    dist = F.bit_count(F.col("int_a").bitwiseXOR(F.col("int_b")))
    return cand.select("id_a", "id_b", dist.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


def doc_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 16,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Per-document dedup signature record: (id, digest, mh0..mh{k-1}).

    This is the SIGNATURE STORE schema for :func:`incremental_dedup` —
    the compact state a 100 TB pipeline persists between ingest batches:
    one md5 of the text (exact-dup key, same rule as :func:`dedup_exact`
    on a single text column) plus k BIGINT min-wise hashes (near-dup
    key; r10 — previously k 32-byte hexes). Per doc that is id + one
    32-byte hex + k longs regardless of document length, so the store
    is orders of magnitude smaller than the corpus and is the ONLY
    thing the next batch ever joins against.

    Docs with fewer than ``n`` tokens (incl. null/empty text) produce no
    shingles and carry NULL mh columns — they still participate in exact
    dedup via the digest, and :func:`incremental_dedup` excludes them
    from band joins (matching :func:`minhash_lsh_pairs`, which never
    emits them).

    Persistence at scale: write the store bucketed by ``digest``
    (``sources.sink.write_bucketed``) so the exact anti-join of the next
    batch never reshuffles the store; if batches are large enough that
    the band join dominates, additionally persist the banded projection
    (explode of :func:`_band_key_entries`) bucketed by ``band_key``.

    Two scans of ``df`` (digest expression + shingle kernel, joined on
    id) — fine for the incremental use case where ``df`` is one batch.
    """
    reserved = {"digest", *(f"mh{i}" for i in range(num_hashes))}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"doc_signatures emits columns {sorted(clash)} that already "
            "exist on the input — rename them first"
        )
    digest = F.md5(F.coalesce(F.col(text_col).cast("string"), F.lit(" ")))
    digests = df.select(F.col(id_col), digest.alias("digest"))
    sig = minhash_signatures(df, text_col, id_col, n, num_hashes, min_parallelism)
    return digests.join(sig, id_col, "left")


def incremental_dedup(
    batch: DataFrame,
    store: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    max_iter: int = 25,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Dedup a NEW batch against an existing corpus signature store — the
    daily operating mode of a crawl pipeline: the 100 TB corpus is never
    re-deduped; each increment is adjudicated against the compact
    :func:`doc_signatures` store and the survivors' signatures are
    appended to it.

    Returns the surviving batch rows with ``digest`` and ``mh*`` columns
    appended, so the caller extends the store WITHOUT recomputing:
    ``store.unionByName(survivors.select(id, "digest", "mh0", ...))``.

    A batch doc is DROPPED iff any of:

    1. exact: another batch doc with the same digest and a smaller id,
       or any store doc with the same digest;
    2. near-dup vs store: its estimated Jaccard (fraction of equal
       minhashes) against any store doc sharing an LSH band is ≥
       ``threshold``;
    3. near-dup within batch: it is not the representative (min id) of
       its within-batch near-dup connected component, or its component
       contains ANY doc dropped by rule 2 (the component is
       "contaminated": in a full-corpus rerun the store doc would be the
       component representative, evicting every batch member).

    Rule 3's contamination clause is what makes the increment EXACTLY
    equivalent to a full-corpus rerun for the batch docs, provided ids
    are monotone across batches (store ids < batch ids — the natural
    ingest order) — differential-tested in tests/test_incremental_dedup.
    Store-internal edges (possible when the store was bootstrapped from
    an undeduplicated corpus) cannot change any batch doc's fate: every
    store id is smaller than every batch id, so a batch doc loses to its
    component's store members regardless of how those interconnect.

    Join shapes at scale (store ≫ batch): the exact anti-join touches
    only the store's digest column (shuffle-free when the store is
    bucketed by digest); the band probe explodes ``bands`` rows per doc
    on both sides but carries only (band_id, band_key, k BIGINT hashes); every
    drop list is batch-derived (increment-sized), so AQE broadcasts it
    and the batch frame never wide-shuffles. Nothing here scans store
    TEXT — only signatures.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    mh_cols = [f"mh{i}" for i in range(num_hashes)]

    # r14 (guide §2.4): the digest is a PROJECTION on the batch, not a
    # join — the previous doc_signatures(batch) ⋈ batch shape evaluated
    # the batch three times (digest branch, shingle branch, text side)
    # and paid two id-keyed joins; this pays one (the minhash aggregate
    # is the only branch that must re-scan, and its output is k longs
    # per id). Same digest expression as doc_signatures — the store
    # schema and every drop rule are unchanged.
    digest = F.md5(F.coalesce(F.col(text_col).cast("string"), F.lit(" ")))
    sig_b = minhash_signatures(batch, text_col, id_col, n, num_hashes, min_parallelism)
    enriched = batch.withColumn("digest", digest).join(sig_b, id_col, "left")

    # rule 1a: within-batch exact — keep the min id per digest
    w = Window.partitionBy("digest").orderBy(id_col)
    enriched = (
        enriched.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    # rule 1b: exact vs store (digest-only projection of the store)
    enriched = enriched.join(store.select("digest"), "digest", "left_anti")
    # survivors of rule 1 feed both band probes; executor-local
    # materialization so the store probe, the self-join, and the final
    # anti-joins don't each re-run the shingle kernel (batch-sized).
    # Lazy (r14): an eager checkpoint is its own scheduled job; lazy
    # materializes inside the first consuming job (identical blocks,
    # one fewer scheduling round per call — this runs per BATCH in
    # production, so the driver-loop floor compounds).
    enriched = enriched.localCheckpoint(eager=False)

    entries = _band_key_entries(num_hashes, bands)

    def banded(df_sig: DataFrame, idc: str, prefix: str) -> DataFrame:
        return (
            df_sig.where(F.col("mh0").isNotNull())
            .select(F.col(idc), F.explode(entries).alias("e"), *mh_cols)
            .select(
                F.col(idc).alias(f"{prefix}id"),
                F.col("e.band_id").alias("band_id"),
                F.col("e.band_key").alias("band_key"),
                *[F.col(c).alias(f"{prefix}{c}") for c in mh_cols],
            )
        )

    # rule 2: batch-vs-store band probe — est Jaccard on the joined row
    bb = banded(enriched.select(id_col, *mh_cols), id_col, "b_")
    bs = banded(store, id_col, "s_")
    eq_bs = sum(
        F.when(F.col(f"b_mh{i}") == F.col(f"s_mh{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    # materialized once (increment-sized): the drop set consumes hits
    # THREE times (contamination probe, component join, union) and each
    # consumer would otherwise re-run the store band probe
    hits = (
        bb.join(bs, ["band_id", "band_key"])
        .where(eq_bs.cast("double") / float(num_hashes) >= threshold)
        .select(F.col("b_id").alias("node"))
        .distinct()
        # lazy for the same reason as `enriched` above: the three
        # consumers share the blocks; the first job to touch them
        # materializes the store probe exactly once
        .localCheckpoint(eager=False)
    )

    # rule 3: within-batch pairs (same single-consumer shape as
    # minhash_lsh_pairs) → components → contamination
    b2 = banded(enriched.select(id_col, *mh_cols), id_col, "x_")
    b3 = b2.select(
        F.col("x_id").alias("y_id"),
        "band_id",
        "band_key",
        *[F.col(f"x_mh{i}").alias(f"y_mh{i}") for i in range(num_hashes)],
    )
    eq_bb = sum(
        F.when(F.col(f"x_mh{i}") == F.col(f"y_mh{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    pairs = (
        b2.join(b3, ["band_id", "band_key"])
        .where(F.col("x_id") < F.col("y_id"))
        .where(eq_bb.cast("double") / float(num_hashes) >= threshold)
        .select(F.col("x_id").alias("id_a"), F.col("y_id").alias("id_b"))
        .distinct()
    )
    from time_series_loader_spark.operators.graph import connected_components

    comp = connected_components(pairs, "id_a", "id_b", max_iter)
    bad_comp = comp.join(hits, "node").select("component").distinct()
    drop = (
        comp.where(F.col("node") != F.col("component"))
        .select("node")
        .union(comp.join(bad_comp, "component").select("node"))
        .union(hits.select("node"))
        .distinct()
        .withColumnRenamed("node", id_col)
    )
    return enriched.join(drop, id_col, "left_anti")
