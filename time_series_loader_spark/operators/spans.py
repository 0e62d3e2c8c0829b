"""Exact-substring (repeated-span) deduplication.

Lee et al., "Deduplicating Training Data Makes Language Models Better"
(ACL 2022, public) showed that beyond whole-document dedup, corpora are
riddled with long VERBATIM SPANS repeated across otherwise-distinct
documents (boilerplate, licenses, templated passages) — and that
removing repeated spans of ≥ ~50 tokens measurably improves models.
Their implementation is an offline suffix array; the Spark-native
equivalent here detects repeats at a fixed span length ``n`` via
positional n-gram digests: any two documents sharing a repeated
substring of length ≥ n share its length-n prefixes, so flagged
[start, start+n) windows tile every long repeat (a repeat of length L ≥ n
is covered by L−n+1 flagged windows — removal of flagged positions
removes the whole repeat).

Scale shape and its honest cost: the positional-digest explode emits
one (id, pos, 16-byte digest) row per token — the groupBy(digest) that
finds cross-document repeats shuffles ~20-30× the corpus's token count
in bytes. That is the inherent price of EXACT substring matching
(Lee et al. pay it as suffix-array construction IO); run it as a
periodic offline pass, after cheap dedup stages shrank the corpus, not
per-ingest. Every downstream frame (dup digests, flagged positions) is
duplicate-sized — small for healthy corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from time_series_loader_spark.operators.text import tokens


def _fan_out(df: DataFrame, min_parallelism: int | None) -> DataFrame:
    """Opt-in round-robin repartition for single-file sources: the
    per-position HOF work downstream is per-row, so parallelism comes
    ENTIRELY from input partitioning — one unsplittable parquet file
    serializes it on one core no matter how many exist (text_profile's
    min_parallelism rationale; measured r10: the whole spans/winnowed
    cost at sf0.1 ran single-partition, 2.1 s → 1.2 s / 2.8 s → 2.0 s
    after fanning out). Leave None on real multi-file corpora."""
    if min_parallelism and df.rdd.getNumPartitions() < min_parallelism:
        return df.repartition(min_parallelism)
    return df


def _positional_digests(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    min_parallelism: int | None = None,
) -> DataFrame:
    """(id, start, digest): md5 of the n-token span starting at each
    0-based token position (transform over materialized tokens — the
    linear form per dedup.py's shingle notes)."""
    df = _fan_out(df, min_parallelism)
    toked = df.select(F.col(id_col), tokens(text_col).alias("_t"))
    m = F.size("_t") - (n - 1)
    span = F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(1), m),
            lambda i: F.struct(
                (i - 1).cast("int").alias("start"),
                F.md5(F.concat_ws(" ", F.slice(F.col("_t"), i, n))).alias("digest"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<start:int,digest:string>>"))
    return toked.select(F.col(id_col), F.explode(span).alias("s")).select(
        id_col, "s.start", "s.digest"
    )


def repeated_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 50,
    min_docs: int = 2,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Flag every length-``n`` token span whose verbatim text occurs in
    ≥ ``min_docs`` DISTINCT documents.

    Output: (``id_col``, start, end, digest, n_docs) with [start, end)
    0-based token positions — the audit view (which docs share which
    boilerplate, how widespread). ``remove_repeated_spans`` consumes the
    same flags to rewrite the corpus.
    """
    spans = _positional_digests(df, text_col, id_col, n, min_parallelism)
    # one-pass distinct-doc count (r14): the groupBy(digest) + join-back
    # form evaluated the positional-digest explode TWICE (Spark shares
    # no work between a frame and its own aggregate — the md5-per-token
    # pass is the dominant cost) and sort-merge-joined the two. One
    # exchange by digest + two window functions over the same sort give
    # identical n_docs: dense_rank over id, then its partition max =
    # count of distinct ids (no per-group set in memory, unlike
    # collect_set).
    w_sort = Window.partitionBy("digest").orderBy(id_col)
    w_all = Window.partitionBy("digest").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        spans.withColumn("_dr", F.dense_rank().over(w_sort))
        .withColumn("n_docs", F.max("_dr").over(w_all).cast("long"))
        .where(F.col("n_docs") >= min_docs)
        .select(
            id_col,
            "start",
            (F.col("start") + n).alias("end"),
            "digest",
            "n_docs",
        )
    )


def remove_repeated_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 50,
    min_docs: int = 2,
    keep_first: bool = True,
) -> DataFrame:
    """Rewrite the corpus with repeated spans removed.

    ``keep_first=True`` (Lee et al. semantics: keep ONE occurrence)
    retains each repeat in the smallest-id document containing it.
    Keeper resolution is per POSITION, not per digest: a position is
    removed only if NO flagged window covering it belongs to this doc's
    keeper set — so a lower-id doc that shares only a short prefix of a
    longer repeat can't punch a hole through the occurrence another doc
    was supposed to keep (at most the genuinely-shared prefix token
    goes). ``False`` strips every occurrence.

    Output: (``id_col``, ``text_col``). Documents with NOTHING flagged
    pass through with their text byte-identical (casing, whitespace and
    all); rewritten documents are rebuilt from the surviving
    ORIGINAL-CASE tokens joined by single spaces (detection tokenizes
    lowercased, but lowercasing never moves whitespace, so positions
    align with the raw split). Fully-stripped docs come back as empty
    strings. Overlapping flagged spans union naturally (removal is by
    token position — tiling windows never double-remove).
    """
    flagged = repeated_spans(df, text_col, id_col, n, min_docs)

    def _positions(fr: DataFrame) -> DataFrame:
        return fr.select(
            F.col(id_col),
            F.explode(F.sequence(F.col("start"), F.col("end") - 1)).alias("pos"),
        ).distinct()

    if keep_first:
        first = flagged.groupBy("digest").agg(F.min(id_col).alias("_first_id"))
        with_first = flagged.join(first, "digest")
        keeper_pos = _positions(with_first.where(F.col(id_col) == F.col("_first_id")))
        bad_pos = _positions(
            with_first.where(F.col(id_col) != F.col("_first_id"))
        ).join(keeper_pos, [id_col, "pos"], "left_anti")
    else:
        bad_pos = _positions(flagged)

    return rebuild_without_positions(df, text_col, id_col, bad_pos)


def rebuild_without_positions(
    df: DataFrame, text_col: str, id_col: str, bad_pos: DataFrame
) -> DataFrame:
    """Rewrite ``text_col`` dropping the 0-based whitespace-token
    positions listed in ``bad_pos`` (``id_col``, pos). Shared rewrite
    tail of :func:`remove_repeated_spans` and
    `decontam.strip_contamination` (r12): documents with no flagged
    position pass through byte-identical; touched documents are rebuilt
    from the surviving ORIGINAL-CASE tokens joined by single spaces;
    fully-stripped documents come back as empty strings. Output:
    (``id_col``, ``text_col``)."""
    touched = bad_pos.select(id_col).distinct()
    # raw (case-preserving) tokens: same split boundaries as tokens()
    raw_toks = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = (
        df.join(touched, id_col, "left_semi")
        .select(F.col(id_col), F.posexplode(raw_toks).alias("pos", "tok"))
    )
    kept = toks.join(bad_pos, [id_col, "pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col("tok")))),
                lambda s: s["tok"],
            ),
        ).alias(text_col)
    )
    untouched = df.join(touched, id_col, "left_anti").select(id_col, text_col)
    # fully-stripped docs drop out of the rebuild groupBy — reattach empty
    stripped = (
        touched.join(rebuilt.select(id_col), id_col, "left_anti")
        .select(F.col(id_col), F.lit("").alias(text_col))
    )
    return untouched.unionByName(rebuilt).unionByName(stripped)


def repeated_spans_winnowed(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 50,
    w: int = 16,
    min_docs: int = 2,
    minimizer_hash: str = "xxhash64",
    min_parallelism: int | None = None,
) -> DataFrame:
    """Winnowed (minimizer-sampled) repeated-span detection — the 100 TB
    scale path for :func:`repeated_spans`.

    Winnowing (Schleimer, Wilkerson & Aiken, SIGMOD 2003, public — the
    MOSS fingerprinting algorithm): instead of shuffling one positional
    digest per TOKEN, slide a window of ``w`` consecutive n-gram hashes
    over each document and keep only each window's MINIMUM (ties →
    leftmost). Expected selected density is 2/(w+1), so the shuffle
    carries ~2/(w+1) of the token count — w=16 cuts the exact pass's
    dominant cost ~8× — and the paper's guarantee holds: any verbatim
    repeat of length ≥ ``w + n − 1`` tokens contains a full window of
    identical n-gram hashes in every occurrence, whose minimum is
    selected identically in each, so the repeat is ALWAYS detected.
    Repeats shorter than w+n−1 (but ≥ n) may be missed — that is the
    traded coverage, and why the exact operator remains the
    oracle-checked gate semantics.

    Exactness of what IS flagged: candidates group on a 64-bit xxhash
    (cheap, fixed-width shuffle rows); flagged groups are then VERIFIED
    on the actual span text before counting, so a hash collision can
    widen the candidate set but never a reported ``n_docs`` —
    the output relation contains no false positives.

    Output: (``id_col``, start, end, digest = md5 of the span text,
    n_docs) — same shape as :func:`repeated_spans`, but rows are the
    sampled ANCHOR windows (one per selected minimizer inside a repeat),
    not every covering window. ``n_docs`` counts the docs that SAMPLED
    the anchor — a lower bound on the true occurrence count (and the
    row exists only when that bound reaches ``min_docs``). For anchors
    selected by a window fully interior to the repeat, the count is
    EXACT: interior windows see identical hashes in every occurrence,
    so every containing doc selects the same relative anchors; only
    edge-window-selected anchors can carry partial counts. Every
    guaranteed-length repeat has interior windows, hence at least one
    full-count anchor.

    Scale shape: per-doc array expressions (O(m·w) comparisons, all
    inside codegen) → explode ~2m/(w+1) rows of (id, pos, BIGINT) →
    groupBy(hash) → candidate-only text verify (duplicate-sized) →
    exact regroup. No corpus-sized string shuffle anywhere: the wide
    exchange carries 8-byte hashes, and span TEXT is materialized only
    for candidates.
    """
    if w < 2:
        raise ValueError("w must be >= 2 (w=1 degenerates to every position)")
    # minimizer_hash picks the n-gram hash the window-minimum ranks on:
    # - "xxhash64" (default): 8-byte keys — the 100 TB shuffle shape.
    # - "md5": 32-char hex keys ranked lexicographically — 4× wider
    #   rows, but md5 is the one hash every engine evaluates identically,
    #   so the SELECTED ANCHOR SET (not just the verified output) is
    #   cross-engine reproducible — what the oracle-gated winnowed
    #   section certifies. Detection guarantees are hash-agnostic.
    if minimizer_hash == "xxhash64":
        _hash1, _hty = F.xxhash64, "array<bigint>"
    elif minimizer_hash == "md5":
        _hash1, _hty = F.md5, "array<string>"
    else:
        raise ValueError(f"unknown minimizer_hash {minimizer_hash!r}")
    toked = _fan_out(df, min_parallelism).select(
        F.col(id_col), tokens(text_col).alias("_t")
    )
    m = F.size("_t") - (n - 1)  # number of n-gram positions
    h = F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(1), m),
            lambda i: _hash1(F.concat_ws(" ", F.slice(F.col("_t"), i, n))),
        ),
    ).otherwise(F.array().cast(_hty))
    toked = toked.withColumn("_h", h)

    # minimizer selection: for each window t (1-based, length w — or the
    # whole array when m < w), the leftmost position attaining the
    # window minimum; distinct positions form the fingerprint set.
    # LET-BINDING TRICK: the hash array must be a lambda-bound variable
    # (transform over a 1-element array), NOT a column reference —
    # Catalyst inlines multiply-referenced projection expressions into
    # higher-order-function arguments, and with ~2(m−w) references the
    # O(m) hash computation re-runs per WINDOW, turning O(m·w) selection
    # into O(m²·n) (measured: 5 docs × 200 tokens = 52 s before, <1 s
    # after). Same pitfall class as text._quality_named's token array.
    def _selected(harr):
        nh = F.size(harr)
        win = F.least(nh, F.lit(w))
        # inner let binds each window slice once (argmin needs it twice)
        argmin = lambda t: F.element_at(
            F.transform(
                F.array(F.slice(harr, t, win)),
                lambda sl: F.array_position(sl, F.array_min(sl)),
            ),
            1,
        )
        return F.when(
            nh >= 1,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), nh - win + 1),
                    lambda t: t - 1 + argmin(t),
                )
            ),
        ).otherwise(F.array().cast("array<bigint>"))

    # resolve each selected anchor to a SMALL (start, h64) struct INSIDE
    # the let-binding, BEFORE exploding. Two traps fixed here: (1) the
    # first cut exploded positions while carrying _t/_h alongside, which
    # copies the full token+hash arrays into EVERY anchor row — an
    # O(m²/w) blowup per document (a 20k-token doc took 136 s; linear
    # after); (2) the structs must NOT embed the span text — Catalyst
    # cannot prune a struct field built inside a generator's nested
    # lambda, so a span field would materialize n-token strings for all
    # anchors corpus-wide even in the count branch that only needs the
    # 8-byte hash. Span text is attached later, for CANDIDATE docs only.
    anchors = F.element_at(
        F.transform(
            F.array(F.col("_h")),
            lambda harr: F.transform(
                _selected(harr),
                lambda p: F.struct(
                    (p - 1).cast("int").alias("start"),
                    F.element_at(harr, p.cast("int")).alias("h64"),
                ),
            ),
        ),
        1,
    )
    picked = (
        toked.select(F.col(id_col), F.explode(anchors).alias("_a"))
        .select(
            F.col(id_col),
            F.col("_a.start").alias("start"),
            F.col("_a.h64").alias("_h64"),
        )
    )
    # candidate anchors shared by >= min_docs distinct docs (r14: ONE
    # pass over `picked` — the groupBy(_h64) + join-back form evaluated
    # the whole minimizer-selection pipeline twice, and the expensive
    # term here is exactly that per-doc selection. One exchange of the
    # narrow (id, start, h64) rows + dense_rank/max over the same sort
    # filters identically; no _t array ever shuffles, as guarded by
    # test_winnowed_plan_shape).
    w_sort = Window.partitionBy("_h64").orderBy(id_col)
    w_all = Window.partitionBy("_h64").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    hits = (
        picked.withColumn("_dr", F.dense_rank().over(w_sort))
        .withColumn("_nd", F.max("_dr").over(w_all))
        .where(F.col("_nd") >= min_docs)
        .select(id_col, "start")
    )
    # re-attach the token arrays for CANDIDATE DOCS ONLY to build the
    # span text: hits is duplicate-sized and broadcast EXPLICITLY, so
    # the corpus-sized token frame neither shuffles nor materializes
    # spans for non-candidate rows; the slice happens post-join
    toked_t = df.select(F.col(id_col), tokens(text_col).alias("_t"))
    verified = toked_t.join(F.broadcast(hits), id_col).select(
        F.col(id_col),
        "start",
        F.concat_ws(" ", F.slice(F.col("_t"), F.col("start") + 1, n)).alias("_span"),
    )
    # exact per-span distinct-doc count, same one-pass window shape
    # (verified — candidate-sized — shuffles once by span text instead
    # of being evaluated twice and sort-merge-joined with itself)
    ws_sort = Window.partitionBy("_span").orderBy(id_col)
    ws_all = Window.partitionBy("_span").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        verified.withColumn("_dr", F.dense_rank().over(ws_sort))
        .withColumn("n_docs", F.max("_dr").over(ws_all).cast("long"))
        .where(F.col("n_docs") >= min_docs)
        .select(
            id_col,
            "start",
            (F.col("start") + n).alias("end"),
            F.md5("_span").alias("digest"),
            "n_docs",
        )
    )
