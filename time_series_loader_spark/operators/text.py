"""Text-analysis operators for large-scale document pipelines.

Beyond-reference capability (BASELINE.json north star): token counting,
quality scoring, language ID, fingerprinting, SimHash — each expressed with
built-in ``pyspark.sql.functions`` only (no Python UDFs in the hot path),
so the whole stage stays inside whole-stage codegen and scales linearly
with one groupBy shuffle at most.

Determinism: every derived number is a pure function of the text with
exact integer/string ops (regexp counts, md5), so results are identical
across partitionings and engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tokenization shared by all operators: lowercase, trim, split on runs of
# whitespace. (A BPE-ish regex tokenizer is exposed via token_count_bpeish.)
def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(c)), r"\s+")


STOPWORDS = {
    "en": ("the", "a", "of", "to", "and", "in", "is", "it", "you", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr": ("le", "les", "et", "est", "une", "des", "dans", "pour"),
    "es": ("el", "los", "y", "es", "una", "las", "por", "como"),
}


def token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Token count, char counts, mean token length (whitespace tokenizer)."""
    t = tokens(text_col)
    n_tokens = F.size(t)
    # characters excluding whitespace
    n_alpha = F.length(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", ""))
    return df.select(
        id_col,
        F.length(text_col).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (n_alpha.cast("double") / F.nullif(n_tokens, F.lit(0))).alias(
            "mean_token_len"
        ),
    )


def token_count_bpeish(text: Column | str) -> Column:
    """BPE-ish token estimate: words + digits + punctuation as separate
    tokens (a common ~GPT-2-regex approximation).

    Expression form. Java regex alternation costs ~1.5 µs/char here —
    measured as the single most expensive expression in the one-pass
    profile (6.6 s of 19 s at the 500k-doc probe; possessive
    quantifiers and regexp_count change nothing, the scan itself is
    the cost). `text_profile` therefore computes the VALUE-identical
    count inside its Arrow kernel via vectorized codepoint classes
    (:func:`_bpeish_count`, equality test-pinned incl. non-ASCII);
    this expression stays the public single-column form. Type caveat
    (ADVICE r10): this expression returns ``F.size``'s IntegerType,
    while the profile's ``n_tokens_bpeish`` column is LongType — an
    int→bigint schema change introduced when the count moved into the
    kernel (r10); profile consumers reading the old int type should
    note it where the profile schema is documented (it is, at the
    schema StructField below). VALUES are equal; the test sweeps
    case-mapping-affected codepoint ranges, not just fixtures."""
    c = F.col(text) if isinstance(text, str) else text
    pieces = F.regexp_extract_all(
        F.lower(c), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), F.lit(0)
    )
    return F.size(pieces)


def _bpeish_count(s: str | None) -> int | None:
    """Vectorized replica of :func:`token_count_bpeish` for the Arrow
    kernel: on the lowercased text, count = (runs of [a-z]) + (runs of
    [0-9]) + (single chars neither alnum nor Java-\\s). Codepoint
    classes over a uint32 view — no regex engine, ~10x cheaper than the
    Java-regex alternation at corpus scale. `str.lower()` and Java
    `lower()` both apply Unicode default full case mappings (the İ→i̇
    expansion included), and every non-[a-z0-9] char lands in the
    same 'other' class either way.

    Environment assumption (ADVICE r10): "both apply the default full
    case mapping" is only bit-identical when the JRE's and CPython's
    Unicode data tables agree for the codepoints present — the tables
    track different Unicode versions across releases (e.g. Cherokee
    gained lowercase forms in Unicode 8.0, Georgian Mtavruli in 11.0).
    The claim is therefore ENVIRONMENT-dependent, not universal; the
    equality test (`test_bpeish_kernel_equals_expression`) sweeps the
    case-mapping-affected ranges (Latin-1/Extended, Greek, Cyrillic,
    Armenian, Georgian, Cherokee, Latin-Ext-Additional, special
    expansions İ/ẞ/ﬁ) in the RUNNING environment rather than trusting
    a fixed fixture list, so a JRE/CPython Unicode-version split
    surfaces as a test failure, not silent count drift."""
    import numpy as np

    if s is None:
        return None
    c = np.frombuffer(s.lower().encode("utf-32-le"), dtype=np.uint32)
    if c.size == 0:
        return 0
    is_l = (c >= 97) & (c <= 122)
    is_d = (c >= 48) & (c <= 57)
    is_ws = (c == 32) | ((c >= 9) & (c <= 13))
    other = int((~(is_l | is_d | is_ws)).sum())

    def runs(m) -> int:
        return int(m[0]) + int((m[1:] & ~m[:-1]).sum())

    return runs(is_l) + runs(is_d) + other


def _bpeish_counts_batch(texts) -> list:
    """Whole-batch form of :func:`_bpeish_count` (bit-identical,
    equality test-pinned): all texts lowercase-joined into ONE uint32
    codepoint buffer, class masks computed once, run-starts forced
    closed at row boundaries, per-row sums via ``np.add.reduceat`` at
    the row offsets. Removes the per-row numpy call overhead that cost
    ~+0.2 s at 5k docs (the per-row form's only weakness; at 500k docs
    both beat the Java-regex expression by >2x)."""
    import numpy as np

    out: list = [None] * len(texts)
    lows, idx = [], []
    for i, s in enumerate(texts):
        if s is not None:
            lows.append(s.lower())
            idx.append(i)
    if not lows:
        return out
    lens = np.fromiter((len(x) for x in lows), dtype=np.int64, count=len(lows))
    c = np.frombuffer("".join(lows).encode("utf-32-le"), dtype=np.uint32)
    if c.size == 0:
        for i in idx:
            out[i] = 0
        return out
    offs = np.zeros(len(lows), dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    is_l = (c >= 97) & (c <= 122)
    is_d = (c >= 48) & (c <= 57)
    is_ws = (c == 32) | ((c >= 9) & (c <= 13))
    other = ~(is_l | is_d | is_ws)
    row_starts = offs[lens > 0]

    def run_starts(m):
        prev = np.empty_like(m)
        prev[0] = False
        prev[1:] = m[:-1]
        prev[row_starts] = False  # a run never crosses a row boundary
        return m & ~prev

    tok = (
        run_starts(is_l).astype(np.int64)
        + run_starts(is_d)
        + other
    )
    sums = iter(np.add.reduceat(tok, row_starts).tolist())
    for i, low in zip(idx, lows):
        out[i] = int(next(sums)) if low else 0
    return out


# the classic UTF-8-bytes-decoded-as-Latin-1/Windows-1252 artifacts that
# mojibake repair tools (ftfy being the canonical public one) target:
# 'Ã'+continuation (é→Ã©, ü→Ã¼ …), 'â€'+mark (’→â€™, “→â€œ, —→â€”),
# stray 'Â' (non-breaking-space artifact), and U+FFFD replacement chars.
# Plain literal alternation + '.', identical semantics in Java regex
# (Spark) and RE2 (DuckDB) — no classes, no lookaround.
MOJIBAKE_PATTERN = "Ã.|â€.|Â|�"


def mojibake_hits(text: Column | str) -> Column:
    """Count of classic encoding-corruption artifacts (mojibake) in the
    text — the data-quality signal curation pipelines use to route docs
    to re-decoding or the reject pile. Integer, cheap (one regexp scan,
    whole-stage codegen), zero false positives on pure-ASCII text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(MOJIBAKE_PATTERN)).cast("long")


def _quality_named(text_col: str, toks: Column | None = None) -> dict[str, Column]:
    """Quality-feature expressions (shared by quality_features/text_profile)
    as an ordered {output_name: expression} mapping — the names are the
    lookup contract (see :func:`quality_score_expr`), not a parsed repr.

    ``toks``: optional pre-tokenized array column. Each expression embeds
    its own copy of ``tokens(text_col)`` otherwise, and whole-stage
    codegen's subexpression elimination does not reach into higher-order
    function arguments — materializing the token array in a separate
    upstream projection (which CollapseProject keeps, the expression being
    non-cheap and multiply-referenced) tokenizes once per row instead of
    once per derived metric.
    """
    t = tokens(text_col) if toks is None else toks
    n_tokens = F.size(t)
    stops = list(STOPWORDS["en"])
    n_stop = F.size(F.filter(t, lambda x: x.isin(*stops)))
    low = F.lower(F.col(text_col))
    n_punct = F.length(F.regexp_replace(low, r"[a-z0-9\s]", ""))
    n_digit = F.length(low) - F.length(F.regexp_replace(low, r"[0-9]", ""))
    n_chars = F.length(text_col)

    # nullif guards: a zero-token / zero-char document (empty or
    # whitespace-only — they exist in any real 100 TB corpus) yields
    # NULL ratios and a NULL quality_score instead of crashing the whole
    # scan with ANSI DIVIDE_BY_ZERO (found by the r10 bpeish-equality
    # fixtures). Non-empty docs are bit-identical to the unguarded form.
    stop_ratio = n_stop.cast("double") / F.nullif(n_tokens, F.lit(0))
    punct_ratio = n_punct.cast("double") / F.nullif(n_chars, F.lit(0))
    digit_ratio = n_digit.cast("double") / F.nullif(n_chars, F.lit(0))
    length_score = F.least(n_tokens.cast("double") / 200.0, F.lit(1.0))
    score = (
        0.4 * length_score
        + 0.4 * F.least(stop_ratio * 5.0, F.lit(1.0))
        + 0.2 * (1.0 - F.least(punct_ratio + digit_ratio, F.lit(1.0)))
    )
    return {
        "n_tokens": n_tokens,
        "stopword_ratio": stop_ratio,
        "punct_ratio": punct_ratio,
        "digit_ratio": digit_ratio,
        "quality_score": F.greatest(F.least(score, F.lit(1.0)), F.lit(0.0)),
    }


def quality_features(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Quality-scoring features + composite score in [0, 1].

    Features: length score (saturating at 200 tokens), stopword ratio,
    punctuation ratio, digit ratio. Score = 0.4*length + 0.4*stop_part
    + 0.2*(1 - punct - digit), clamped to [0,1] — a deterministic stand-in
    for Gopher/C4-style quality rules.
    """
    return df.select(id_col, *_quality_exprs(text_col))


def _quality_exprs(text_col: str, toks: Column | None = None) -> list[Column]:
    """:func:`_quality_named` as an aliased select-list."""
    return [c.alias(n) for n, c in _quality_named(text_col, toks).items()]


def quality_score_expr(text_col: str) -> Column:
    """The composite quality score in [0, 1] as a single named
    expression — for callers (CorpusPipeline) that filter on the score
    without materializing the full feature set. Looked up by KEY in the
    shared {name: expression} mapping, so reordering/extending the
    feature set can't silently change what a filter means (and no
    Column-repr parsing, which has no stability contract)."""
    return _quality_named(text_col)["quality_score"].alias("quality_score")


def gopher_pass_expr(text_col: str) -> Column:
    """The combined Gopher-rule pass flag as a single named expression
    (see :func:`quality_score_expr` for why selection is by key)."""
    return _gopher_named(text_col)["pass_gopher"].alias("pass_gopher")


def langid_pred_expr(text_col: str) -> Column:
    """The predicted-language column as a single named expression."""
    return _langid_named(text_col)["lang_pred"].alias("lang_pred")


# The "required words" rule from the Gopher paper (Rae et al. 2021,
# public): a natural-language English document almost surely contains at
# least 2 of these.
REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _gopher_named(text_col: str, toks: Column | None = None) -> dict[str, Column]:
    """Gopher/C4-style rule-filter expressions (shared by
    gopher_quality_flags/text_profile) as {output_name: expression}.

    All pure built-in expressions (split/filter/replace/regexp) — the
    whole rule battery stays inside whole-stage codegen, zero shuffle,
    and is a deterministic pure function of the text (identical across
    partitionings and engines; the DuckDB oracle rebuilds every rule).

    ``toks``: optional pre-tokenized array column (see _quality_exprs).
    """
    t = tokens(text_col) if toks is None else toks
    n_tokens = F.size(t)
    txt = F.col(text_col)
    low = F.lower(txt)

    # symbol-to-word ratio: '#' occurrences + '...' occurrences per token
    n_hash = F.length(txt) - F.length(F.replace(txt, F.lit("#"), F.lit("")))
    n_ellipsis = (F.length(txt) - F.length(F.replace(txt, F.lit("..."), F.lit("")))) / 3
    # nullif: zero-token docs yield NULL ratios (not ANSI DIVIDE_BY_ZERO);
    # the combined `passed` flag stays false (ANSI false AND NULL = false
    # via the n_tokens >= 50 conjunct)
    symbol_ratio = (n_hash + n_ellipsis) / F.nullif(n_tokens, F.lit(0))

    # line-level rules over non-blank trimmed lines
    lines = F.filter(
        F.transform(F.split(txt, "\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )
    n_lines = F.size(lines)

    def _line_frac(pred) -> Column:
        frac = F.size(F.filter(lines, pred)).cast("double") / n_lines
        return F.when(n_lines > 0, frac).otherwise(F.lit(0.0))

    bullet_frac = _line_frac(lambda l: F.substring(l, 1, 1).isin("-", "*", "•"))
    ellipsis_frac = _line_frac(lambda l: l.rlike(r"\.\.\.$"))
    dup_line_frac = F.when(
        n_lines > 0,
        F.lit(1.0) - F.size(F.array_distinct(lines)).cast("double") / n_lines,
    ).otherwise(F.lit(0.0))

    alpha_frac = F.size(F.filter(t, lambda x: x.rlike("[a-z]"))).cast(
        "double"
    ) / F.nullif(n_tokens, F.lit(0))
    n_req = F.size(
        F.array_intersect(
            F.array_distinct(t), F.lit(list(REQUIRED_STOPWORDS))
        )
    )
    mean_len = (
        F.length(F.regexp_replace(low, r"\s+", "")).cast("double")
        / F.nullif(n_tokens, F.lit(0))
    )

    passed = (
        (n_tokens >= 50)
        & (n_tokens <= 100000)
        & (mean_len >= 3.0)
        & (mean_len <= 10.0)
        & (symbol_ratio <= 0.1)
        & (bullet_frac <= 0.9)
        & (ellipsis_frac <= 0.3)
        & (alpha_frac >= 0.8)
        & (n_req >= 2)
        & (dup_line_frac <= 0.3)
    )
    return {
        "symbol_token_ratio": symbol_ratio,
        "bullet_line_frac": bullet_frac,
        "ellipsis_line_frac": ellipsis_frac,
        "dup_line_frac": dup_line_frac,
        "alpha_word_frac": alpha_frac,
        "n_req_stopwords": n_req,
        "pass_gopher": passed,
    }


def _gopher_exprs(text_col: str, toks: Column | None = None) -> list[Column]:
    """:func:`_gopher_named` as an aliased select-list."""
    return [c.alias(n) for n, c in _gopher_named(text_col, toks).items()]


def gopher_quality_flags(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Gopher-rule document filter signals (Rae et al. 2021, §A1.1 — the
    standard pre-training heuristic battery) + the combined pass flag.

    Rules: 50 ≤ word count ≤ 100k; 3 ≤ mean word length ≤ 10;
    symbol-to-word ratio ('#'/'...') ≤ 0.1; ≤ 90% of lines
    bullet-initial; ≤ 30% of lines ellipsis-terminated; ≥ 80% of words
    contain an alphabetic character; ≥ 2 of the 8 "required" English
    stopwords present; duplicate-line fraction ≤ 0.3 (C4-style).

    Emits the raw fractions (for threshold tuning / debugging) plus
    ``pass_gopher``. Zero shuffle; see :func:`_gopher_exprs` for the
    scale shape.
    """
    return df.select(id_col, *_gopher_exprs(text_col))


def _langid_named(text_col: str, toks: Column | None = None) -> dict[str, Column]:
    """Language-ID expressions (shared by language_id/text_profile) as
    {output_name: expression}.

    ``toks``: optional pre-tokenized array column (see _quality_named).
    """
    t = tokens(text_col) if toks is None else toks

    def _in_set(words):
        # single-arg lambda required: PySpark introspects the signature
        return lambda x: x.isin(*words)

    counts = {
        lang: F.size(F.filter(t, _in_set(words))) for lang, words in STOPWORDS.items()
    }
    # argmax via a sorted struct array: (-count, lang) ascending → first
    best = F.array_sort(
        F.array(
            *[
                F.struct((-counts[lang]).alias("neg"), F.lit(lang).alias("lang"))
                for lang in sorted(STOPWORDS)
            ]
        )
    )[0]
    return {
        **{f"score_{lang}": counts[lang] for lang in sorted(STOPWORDS)},
        "lang_pred": F.when(-best["neg"] > 0, best["lang"]).otherwise("und"),
    }


def _langid_exprs(text_col: str, toks: Column | None = None) -> list[Column]:
    """:func:`_langid_named` as an aliased select-list."""
    return [c.alias(n) for n, c in _langid_named(text_col, toks).items()]


def language_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic n-gram/marker language ID over {en, de, fr, es}.

    Score = count of language marker tokens; argmax wins, ties broken by
    higher count then lexicographically smaller language code; all-zero →
    'und'. Deterministic by construction.
    """
    return df.select(id_col, *_langid_exprs(text_col))


def tfidf(
    df: DataFrame,
    text_col: str,
    id_col: str,
    top_k: int | None = None,
    pinned_ln: bool = False,
    integer_scores: bool = False,
    tf_df: DataFrame | None = None,
) -> DataFrame:
    """TF-IDF per (doc, term) over the whitespace-token stream.

    tf = raw term count in the doc; idf = ln((N+1)/(df+1)) + 1 (smooth,
    sklearn-style) **quantized to a 1e-6 grid** (half-up); score =
    tf · idf. Optionally keep only each doc's ``top_k`` terms (ties →
    lexicographically smaller term).

    Why quantize (round-6 hardening): ``ln`` is a transcendental — the
    JVM intrinsic and other engines' libm may disagree in the last ulp,
    and the disagreement is CPU/build-dependent. Quantizing idf makes
    the score an exact integer of micro-units (``tf · round(idf·1e6)``,
    BIGINT — tf ≤ ~1e6 tokens · idf_µ ≤ ~3e7 stays far under 2^63), so
    ranking and every downstream comparison are integer arithmetic:
    bit-identical on every platform and engine. Scores differ from
    unquantized sklearn by < 5e-7·tf — far below any ranking signal.

    ``pinned_ln=True`` (round-7 oracle hardening): idf micro-units come
    from the pinned log table instead of the engine's ``ln`` —
    ``idf_u = ln_u(N+1) − ln_u(df+1) + 1e6`` where ``ln_u`` is the ONE
    frozen ``math.log`` evaluation in ``resources/ln_u_micro.parquet``
    (operators/ln_pinned.py; the oracle SQL reads the same file), so no
    engine evaluates a transcendental at query time. Differs from the
    quantized-engine-ln idf by ≤1 µunit (two roundings instead of one) —
    a deliberate, deterministic quantization choice shared by both
    engines. The pinned domain caps at N+1 ≤ 1e6 documents; the default
    engine-``ln`` path has no such cap and is the 100 TB tool.

    ``integer_scores=True`` emits ``score_u`` (exact BIGINT µunits)
    instead of the ``tfidf`` double — for plans that must stay
    integer-pure end-to-end.

    Scale shape: explode → one (doc,term) groupBy with map-side combine →
    term-level df aggregate (small — vocabulary-sized) broadcast back. The
    N scalar is computed once.
    """
    from pyspark.sql import Window

    n_docs = df.count()
    if tf_df is not None:
        # caller-supplied (id, term, tf) frame — for pipelines that
        # already hold the term-frequency frame (the gate's canary block
        # shares one with the scored path, halving the corpus explode
        # cost AND guaranteeing canaries checksum the SAME tokenization)
        tf = tf_df.select(F.col(id_col), "term", "tf")
    else:
        toks = df.select(
            F.col(id_col), F.explode(tokens(text_col)).alias("term")
        )
        tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if pinned_ln:
        from time_series_loader_spark.operators.ln_pinned import (
            ln_u_df,
            ln_u_lookup,
        )

        # driver-side lookup raises if N+1 is beyond the pinned domain;
        # df+1 ≤ N+1, so the inner join below can never drop a term.
        # Join sides: broadcast the VOCABULARY (small), scan the pinned
        # table distributed — broadcasting the 1M-row table itself would
        # ship ~16 MB to every executor per query for a vocab-sized output
        base_u = ln_u_lookup(n_docs + 1)
        lnu = ln_u_df(df.sparkSession)
        docfreq = lnu.join(
            F.broadcast(docfreq), lnu["k"] == docfreq["df"] + 1
        ).select(
            "term",
            "df",
            (F.lit(base_u) - F.col("ln_u") + F.lit(1_000_000)).alias("_idf_u"),
        )
    else:
        idf_raw = F.log((F.lit(float(n_docs) + 1.0)) / (F.col("df") + 1.0)) + 1.0
        docfreq = docfreq.select(
            "term",
            "df",
            F.floor(idf_raw * F.lit(1e6) + F.lit(0.5)).alias("_idf_u"),
        )
    scored = tf.join(F.broadcast(docfreq), "term").select(
        id_col,
        "term",
        "tf",
        (F.col("tf") * F.col("_idf_u")).alias("_score_u"),
    )
    if top_k is not None:
        w = Window.partitionBy(id_col).orderBy(
            F.col("_score_u").desc(), F.col("term").asc()
        )
        scored = (
            scored.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= top_k)
            .drop("_rn")
        )
    if integer_scores:
        return scored.withColumnRenamed("_score_u", "score_u")
    return scored.withColumn(
        "tfidf", F.col("_score_u").cast("double") / F.lit(1e6)
    ).drop("_score_u")


def unigram_logprob(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: float = 1.0,
    toks_col: str | None = None,
    pinned_ln: bool = False,
    integer_outputs: bool = False,
) -> DataFrame:
    """CCNet-style language-model quality signal: each document's mean
    ``ln P(token)`` under the corpus's OWN add-k-smoothed unigram
    distribution — ``logp(t) = ln((C(t)+k)/(N+k·V))``, doc score =
    Σ_occurrences logp / n_tokens. Very negative = rare-token gibberish;
    near the corpus ceiling = common-word text. The same
    perplexity-bucket idea CCNet (Wenzek et al. 2020, public) uses for
    quality partitioning, with the corpus itself as the reference LM so
    no external model ships.

    Output: (``id_col``, mean_logprob, n_tokens).

    Per-token logp is **quantized to a 1e-6 grid** (half-up) before
    accumulation — same round-6 hardening rationale as :func:`tfidf`:
    ``ln`` is engine/CPU-dependent in the last ulp, so contributions
    become exact BIGINT micro-units (``tf · round(logp·1e6)``) and the
    per-doc sum is integer arithmetic — bit-identical on every platform,
    partition order, and engine. |logp|·1e6 ≤ ~5e7 and per-doc
    Σtf·|logp_µ| stays far under 2^63 for any real document. The mean
    differs from the unquantized value by < 5e-7 — noise for a quality
    signal reported at 1e-6.

    Scale shape: explode → (doc, term) tf groupBy (the same first
    exchange TF-IDF pays) → vocabulary-sized term-total aggregate → join
    back on term (vocab ≪ corpus; AQE broadcasts it when it fits, else
    a term-hash shuffle join) → per-doc integer-accumulated sum (merge-
    order independent, so scores are bit-stable under repartitioning).
    N and V are two driver scalars (one tiny action).

    ``toks_col``: optional pre-tokenized array column — callers that
    already materialized ``tokens(text)`` (corpus_filter's one-scan
    projection) skip a second per-row tokenize in this branch.

    ``pinned_ln=True`` (round-7 oracle hardening; requires the add-1
    integer smoothing, k=1): per-term micro-units come from the pinned
    log table — ``logp_u = ln_u(ct+1) − ln_u(N+V)`` (both integer
    arguments; ``ln_u`` = the ONE frozen ``math.log`` table in
    ``resources/ln_u_micro.parquet``, which the oracle SQL reads too) —
    so no engine evaluates ``ln`` at query time. Differs from the
    quantized-engine-ln value by ≤1 µunit (two roundings instead of
    one); a deterministic quantization shared by both engines. Pinned
    domain caps at N+V ≤ 1e6; the engine-``ln`` path is the 100 TB tool.

    ``integer_outputs=True`` emits ``contrib_u`` (exact BIGINT: the
    doc's Σ tf·logp_u micro-units; mean_logprob = contrib_u/1e6/
    n_tokens) instead of the float mean — for integer-pure plans.
    """
    tok_expr = F.col(toks_col) if toks_col else tokens(text_col)
    toks = df.select(F.col(id_col), F.explode(tok_expr).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # r14 (guide §2.3/§2.4): term totals straight off the explode —
    # Σ_docs tf(doc, t) ≡ count of t occurrences, so the (doc, term)
    # exchange is NOT needed on this branch (Spark shares no work
    # between a frame and its own aggregate, so `tf.groupBy(term)`
    # re-ran the corpus-keyed exchange once for the N/V scalars and
    # once under the logp join). Map-side partial aggregation ships
    # vocabulary-sized partials only; `tf` itself is now evaluated
    # exactly once (under `scored`).
    totals = toks.groupBy("term").agg(F.count(F.lit(1)).alias("ct"))
    nv = totals.agg(
        F.sum("ct").alias("n"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    if pinned_ln:
        if k != 1.0:
            raise ValueError("pinned_ln requires integer add-1 smoothing (k=1)")
        from time_series_loader_spark.operators.ln_pinned import (
            ln_u_df,
            ln_u_lookup,
        )

        # driver-side lookup raises if N+V is beyond the pinned domain;
        # ct+1 ≤ N+1 ≤ N+V, so the inner join can never drop a term.
        # Broadcast the vocabulary side, not the 1M-row pinned table
        denom_u = ln_u_lookup(int(nv["n"] or 0) + int(nv["v"] or 1))
        lnu = ln_u_df(df.sparkSession)
        lp = lnu.join(F.broadcast(totals), lnu["k"] == totals["ct"] + 1).select(
            "term", (F.col("ln_u") - F.lit(denom_u)).alias("_logp_u")
        )
    else:
        denom = float(nv["n"] or 0) + k * float(nv["v"] or 0)
        lp = totals.select(
            "term",
            F.floor(
                F.log((F.col("ct") + F.lit(k)) / F.lit(denom)) * F.lit(1e6)
                + F.lit(0.5)
            ).alias("_logp_u"),  # BIGINT micro-units (negative)
        )
    scored = tf.join(lp, "term").select(
        id_col, "tf", (F.col("tf") * F.col("_logp_u")).alias("_contrib_u")
    )
    if integer_outputs:
        return scored.groupBy(id_col).agg(
            F.sum("_contrib_u").cast("long").alias("contrib_u"),
            F.sum("tf").cast("long").alias("n_tokens"),
        )
    return scored.groupBy(id_col).agg(
        (
            F.sum("_contrib_u").cast("double") / F.lit(1e6) / F.sum("tf")
        ).alias("mean_logprob"),
        F.sum("tf").cast("long").alias("n_tokens"),
    )


def token_entropy(
    df: DataFrame,
    text_col: str,
    id_col: str,
    pinned_ln: bool = False,
    integer_outputs: bool = False,
) -> DataFrame:
    """Shannon entropy of each document's own token distribution —
    ``H = ln(n) − (Σ_t ct·ln(ct))/n`` over the doc's term counts ct
    (n = total tokens). Low entropy = repetitive/degenerate text (the
    keyword-stuffing / copy-loop signal quality pipelines cut on); the
    ceiling ``ln(n)`` is an all-distinct-token document. Natural-log
    nats, like :func:`unigram_logprob`.

    Output: (``id_col``, ``n_tokens``, and ``entropy_u`` BIGINT µunits
    when ``integer_outputs`` else ``entropy`` DOUBLE).

    Per-count ``ln`` contributions are micro-quantized (engine path) or
    pinned-table lookups (``pinned_ln=True``; requires every ct and n
    ≤ the table's 8e6 domain — checked with ONE driver-side scalar
    lookup of max(n) that raises loudly, since ct ≤ n). In
    ``integer_outputs`` mode ``entropy_u = ln_u(n) − (Σ ct·ln_u(ct))
    div n`` — BIGINT arithmetic end-to-end, bit-identical across
    engines and partitionings.

    Scale shape: the same explode → (doc,term) tf groupBy every term
    statistic pays, then a per-doc integer sum. The log lookups never
    touch a corpus-sized join side: distinct ct values (≤ distinct doc
    lengths' worth of small integers) are joined against the pinned
    table and broadcast back; same for distinct n. The engine-ln path
    is the unbounded 100 TB tool (no domain cap, no lookup joins).
    """
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    if pinned_ln:
        from .ln_pinned import ln_u_df, ln_u_lookup

        lnu = ln_u_df(df.sparkSession)
        # loud domain check BEFORE any lossy lookup join — a doc with
        # one term repeated beyond the table's 8e6 domain must raise
        # instead of being silently dropped by the inner join below,
        # which would deflate _n/_s and let a wrong entropy through
        # (ADVICE r7 medium); ct <= n, so max(n) in-domain covers every
        # ct too. r14 (guide §2.4): n == size(tokens(text)) for every
        # doc that yields tf rows, so the check is a PLAIN map-side
        # aggregate over the raw frame -- the previous
        # tf->groupBy(doc)->max chain re-ran the corpus (doc, term)
        # exchange just to validate a scalar.
        tokc = tokens(text_col)
        max_n = df.select(
            F.max(F.when(tokc.isNotNull(), F.size(tokc))).alias("_m")
        ).collect()[0][0]
        if max_n is not None:
            ln_u_lookup(int(max_n))  # raises beyond the pinned domain
        # distinct ct values are FEW (small integers); resolve their
        # ln_u once and broadcast back — never join the corpus-sized
        # tf frame against the 8e6-row table directly
        cts = tf.select(F.col("tf").alias("_ct")).distinct()
        ctmap = lnu.join(F.broadcast(cts), lnu["k"] == F.col("_ct")).select(
            "_ct", F.col("ln_u").alias("_ln_ct_u")
        )
        scored = tf.join(F.broadcast(ctmap), tf["tf"] == ctmap["_ct"])
        # r14: sum(tf) rides the SAME aggregate as sum(tf*ln_u(ct)) — the
        # previous separate doc_n frame (and its join back) was another
        # full evaluation of the tf subtree for a column this groupBy
        # already has in hand
        per_doc_s = scored.groupBy(id_col).agg(
            F.sum(F.col("tf") * F.col("_ln_ct_u")).cast("long").alias("_s"),
            F.sum("tf").cast("long").alias("_n"),
        )
        # candidate n values WITHOUT the (doc, term) exchange: a
        # doc-sized distinct of size(tokens(text)) — a SUPERSET of the
        # realized sum-tf values is fine (nmap is an equality lookup;
        # unmatched entries are dead broadcast rows)
        ns = (
            df.select(F.size(tokc).alias("_nk"))
            .where(F.col("_nk") >= 1)
            .distinct()
        )
        nmap = lnu.join(F.broadcast(ns), lnu["k"] == F.col("_nk")).select(
            "_nk", F.col("ln_u").alias("_ln_n_u")
        )
        per_doc = per_doc_s.join(F.broadcast(nmap), F.col("_n") == F.col("_nk"))
    else:
        ln_ct_u = F.floor(F.log(F.col("tf").cast("double")) * 1e6 + 0.5)
        per_doc = tf.groupBy(id_col).agg(
            F.sum("tf").cast("long").alias("_n"),
            F.sum(F.col("tf") * ln_ct_u).cast("long").alias("_s"),
        )
        per_doc = per_doc.withColumn(
            "_ln_n_u", F.floor(F.log(F.col("_n").cast("double")) * 1e6 + 0.5)
        )
    if integer_outputs:
        # integral div floors the subtracted term → H_u error < 1µ, the
        # same shared deterministic quantization both engines compute
        out = per_doc.select(
            F.col(id_col),
            F.col("_n").alias("n_tokens"),
            F.expr("CAST(_ln_n_u - (_s div _n) AS BIGINT)").alias("entropy_u"),
        )
    else:
        out = per_doc.select(
            F.col(id_col),
            F.col("_n").alias("n_tokens"),
            (
                (F.col("_ln_n_u") - F.col("_s").cast("double") / F.col("_n"))
                / F.lit(1e6)
            ).alias("entropy"),
        )
    return out


def fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.

    (The reference has no doc-level hashing; this is the dedup key primitive
    for the 100 TB pipeline — exact-dup detection is a groupBy on it.)
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select(id_col, F.md5(norm).alias("fingerprint"))


def _repetition_exprs(text_col: str) -> list[Column]:
    """Repetition-signal expressions (shared by repetition_features/profile)."""
    t = tokens(text_col)
    n = F.size(t)
    dup_ratio = F.lit(1.0) - F.size(F.array_distinct(t)).cast(
        "double"
    ) / F.nullif(n, F.lit(0))
    bg = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1)),
    )
    # let-bind the bigram array (house HOF rule): the count lambda
    # references it once per distinct bigram, and an inlined expression
    # would rebuild it each time (~17% measured on 1500-token docs; the
    # remaining cost is the inherent O(distinct·total) filter)
    top = F.element_at(
        F.transform(
            F.array(bg),
            lambda b: F.array_max(
                F.transform(
                    F.array_distinct(b),
                    lambda x: F.size(F.filter(b, lambda y: y == x)),
                )
            ),
        ),
        1,
    )
    top_frac = F.when(n >= 2, top.cast("double") / F.size(bg)).otherwise(F.lit(0.0))
    return [
        dup_ratio.alias("dup_token_ratio"),
        top_frac.alias("top_bigram_frac"),
    ]


def repetition_features(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Gopher-style repetition signals, pure built-in expressions.

    - ``dup_token_ratio``: 1 - distinct_tokens/total_tokens — high for
      degenerate repeated-phrase documents.
    - ``top_bigram_frac``: occurrences of the most frequent word bigram /
      total bigrams (0.0 when the doc has < 2 tokens).

    The bigram mode is an O(distinct·total) per-document array expression —
    fine for web-scale documents (KBs); cap extremely long docs upstream if
    a corpus has MB-scale outliers.
    """
    return df.select(id_col, *_repetition_exprs(text_col))


# (tag, regex) — applied sequentially, each on the already-redacted text,
# so overlapping matches (an email whose domain is an IP) count once.
PII_PATTERNS = (
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("IPV4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("PHONE", r"\+\d[\d \-]{7,}\d"),
)


def redact_pii(
    df: DataFrame, text_col: str, out_col: str = "redacted", count_col: str = "n_pii"
) -> DataFrame:
    """Scrub emails / IPv4 addresses / phone numbers to ``<TAG>`` markers.

    Pure ``regexp_extract_all``/``regexp_replace`` expressions (JVM-side,
    whole-stage codegen, zero shuffle) — the standard pre-training scrub
    pass. ``count_col`` counts redacted spans so downstream filters can
    drop PII-dense documents.
    """
    red = F.col(text_col)
    n = F.lit(0)
    for tag, pat in PII_PATTERNS:
        n = n + F.size(F.regexp_extract_all(red, F.lit(pat), F.lit(0)))
        red = F.regexp_replace(red, pat, f"<{tag}>")
    return df.withColumn(out_col, red).withColumn(count_col, n)


def _simhash_signatures(texts, n_bits: int):
    """md5-digit SimHash signatures for an iterable of strings (None-safe)."""
    import hashlib
    import re

    import numpy as np

    # Java \s (what F.split uses), NOT python \s (which adds unicode spaces)
    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    out = []
    for s in texts:
        if s is None:
            out.append(None)
            continue
        toks = ws.split(s.strip().lower())
        digests = b"".join(hashlib.md5(t.encode("utf-8")).digest() for t in toks)
        M = np.frombuffer(digests, dtype=np.uint8).reshape(len(toks), 16)
        bits = np.unpackbits(M, axis=1)[:, 0 : 4 * n_bits : 4]
        sums = (2 * bits.astype(np.int32) - 1).sum(axis=0)
        out.append("".join("1" if v > 0 else "0" for v in sums))
    return out


def text_profile(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_bits: int = 16,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Single-pass per-document profile: token stats + BPE-ish count +
    quality features + Gopher rule flags + language ID + repetition
    signals + fingerprint + SimHash.

    Scale shape: the O(1)-per-row columns are built-in expressions
    (whole-stage codegen); the per-row O(n) work — simhash AND the
    repetition signals — rides ONE ``mapInPandas`` kernel that PASSES
    THROUGH the already-computed columns: one scan, zero shuffle, no join
    to reassemble per-doc outputs. This is the template for "run every
    per-doc analysis over 100 TB in one pass" rather than one pass per
    metric. (The repetition signals deliberately live in the kernel, not
    in array-lambda expressions: higher-order functions are interpreted
    per element, and the bigram mode is O(distinct·total) per doc — the
    expression form measured ~100× slower at 50k docs; see SCALING.md.)

    ``min_parallelism``: if set and the source yields fewer partitions, a
    round-robin repartition fans the kernel out first. The whole pipeline
    is per-row, so parallelism comes ENTIRELY from input partitioning —
    one fat unsplittable file (a single parquet row-group, a gzip member)
    serializes the kernel no matter how many cores exist (measured: the
    whole r4 text_profile "slowness" was sf0.1's single-partition input;
    see SCALING.md r5 breakdown). Leave None (the default) on real
    multi-file corpora: there the scan already yields ≥cores partitions
    and an unconditional repartition would reshuffle the full corpus for
    nothing.
    """
    from collections import Counter

    from pyspark.sql.types import DoubleType, StringType, StructField, StructType

    # null-text docs are dropped, matching simhash_bits (whose kernel
    # filters them) — so profile and standalone-simhash agree row-for-row
    # on any corpus, nullable or not
    df = df.where(F.col(text_col).isNotNull())
    if min_parallelism and df.rdd.getNumPartitions() < min_parallelism:
        df = df.repartition(min_parallelism)
    # tokenize ONCE in a kept projection (see _quality_exprs docstring)
    t = F.col("__toks")
    toksed = df.select(id_col, text_col, tokens(text_col).alias("__toks"))
    n_tokens = F.size(t)
    n_alpha = F.length(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", ""))
    fp = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    wide = toksed.select(
        F.col(id_col),
        F.col(text_col),
        F.length(text_col).alias("n_chars"),
        *_quality_exprs(text_col, toks=t),  # n_tokens + ratios + quality_score
        (n_alpha.cast("double") / F.nullif(n_tokens, F.lit(0))).alias(
            "mean_token_len"
        ),
        mojibake_hits(text_col).alias("mojibake_hits"),
        *_langid_exprs(text_col, toks=t),
        *_gopher_exprs(text_col, toks=t),
        F.md5(fp).alias("fingerprint"),
    )

    passthrough = [f for f in wide.schema.fields if f.name != text_col]
    # n_tokens_bpeish is computed IN the kernel (vectorized codepoint
    # classes, _bpeish_count) — the Java-regex expression form measured
    # 6.6 s of the 19 s 500k-doc profile, the profile's single most
    # expensive column; splice it into its historical schema position
    # (after mean_token_len) so the output column order is unchanged
    from pyspark.sql.types import LongType

    mt_idx = next(
        i for i, f in enumerate(passthrough) if f.name == "mean_token_len"
    )
    out_schema = StructType(
        [
            *passthrough[: mt_idx + 1],
            StructField("n_tokens_bpeish", LongType()),
            *passthrough[mt_idx + 1 :],
            StructField("dup_token_ratio", DoubleType()),
            StructField("top_bigram_frac", DoubleType()),
            StructField("simhash", StringType()),
        ]
    )
    keep = [f.name for f in passthrough]
    ordered = [f.name for f in out_schema.fields]

    def kernel(batches):
        import re

        ws = re.compile(r"[ \t\n\x0b\f\r]+")  # Java \s, as in tokens()
        for pdf in batches:
            out = pdf[keep].copy()
            dup, top = [], []
            for s in pdf[text_col]:
                if s is None:
                    dup.append(None)
                    top.append(None)
                    continue
                toks = ws.split(s.strip().lower())
                n = len(toks)
                dup.append(1.0 - len(set(toks)) / n)
                if n >= 2:
                    top.append(max(Counter(zip(toks, toks[1:])).values()) / (n - 1))
                else:
                    top.append(0.0)
            out["n_tokens_bpeish"] = _bpeish_counts_batch(
                list(pdf[text_col])
            )
            out["dup_token_ratio"] = dup
            out["top_bigram_frac"] = top
            out["simhash"] = _simhash_signatures(pdf[text_col], n_bits)
            yield out[ordered]

    return wide.mapInPandas(kernel, out_schema)


def simhash_bits(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_bits: int = 32,
    min_parallelism: int | None = None,
) -> DataFrame:
    """n-bit SimHash over whitespace tokens (n ≤ 32).

    Bit d (d = 1..n) uses the d-th hex digit of md5(token): contribution
    +1 if the digit ≥ 8 (its top bit), else -1; summed over all token
    occurrences; final bit = 1 iff the sum > 0. Output is an n-char
    '0'/'1' string. Pure integer ops on md5 bytes → engine-independent
    (the SQL oracle rebuilds the same digit rule from md5 hex).

    Scale shape: a per-ROW Arrow kernel (``mapInPandas``: hashlib md5 +
    numpy bit unpack per batch) — ZERO shuffle, embarrassingly parallel.
    The expression alternative (explode tokens → 32 substring tests →
    32-column partial-sum groupBy) measured ~10× slower: 32 expr evals ×
    tokens beats codegen, and the explode triples the shuffled volume.

    ``min_parallelism``: opt-in round-robin fan-out when the source
    yields fewer partitions (single-file inputs serialize the kernel;
    see :func:`text_profile`). Default None — never reshuffle a corpus
    that already arrives well-partitioned.
    """
    if not 1 <= n_bits <= 32:
        raise ValueError("n_bits must be in [1, 32] (md5 has 32 hex digits)")
    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    if min_parallelism and df.rdd.getNumPartitions() < min_parallelism:
        df = df.repartition(min_parallelism)
    out_schema = StructType([df.schema[id_col], StructField("simhash", StringType())])

    def kernel(batches):
        for pdf in batches:
            # null text → no row (tokens(null) explodes to no rows upstream-style)
            keep = pdf[pdf[text_col].notna()]
            yield pd.DataFrame(
                {
                    id_col: keep[id_col],
                    "simhash": _simhash_signatures(keep[text_col], n_bits),
                }
            )

    return df.select(id_col, text_col).mapInPandas(kernel, out_schema)


def simhash16(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """16-bit SimHash (compact variant; see simhash_bits)."""
    return simhash_bits(df, text_col, id_col, n_bits=16)


def hamming_bits(a: Column, b: Column, n_bits: int = 32) -> Column:
    """Hamming distance between two n-char bit strings (for near-dup)."""
    pos = F.sequence(F.lit(1), F.lit(n_bits))
    return F.aggregate(
        pos,
        F.lit(0),
        lambda acc, i: acc
        + F.when(F.substring(a, i, 1) != F.substring(b, i, 1), 1).otherwise(0),
    )


def hamming16(a: Column, b: Column) -> Column:
    return hamming_bits(a, b, 16)


def normalize_text(
    df: DataFrame,
    text_col: str,
    out_col: str | None = None,
    form: str = "NFC",
    strip_controls: bool = True,
    collapse_whitespace: bool = False,
) -> DataFrame:
    """Unicode normalization for scraped corpora — the hygiene step that
    belongs BEFORE any hash-based dedup: visually-identical strings with
    different codepoint sequences (composed \u00e9 vs e+combining-accent,
    full-width digits, ligatures under NFKC) otherwise land in different
    exact-dedup groups and different span/minhash shingles.

    - ``form``: 'NFC' (canonical compose, the safe default) / 'NFKC'
      (also folds compatibility forms — ligatures, full-width, squared
      digits; lossy by design) / 'NFD' / 'NFKD'.
    - ``strip_controls``: drop C0/C1 control chars (except tab/LF/CR)
      and the zero-width/bidi set (ZWSP ZWNJ ZWJ BOM LRM RLM) — the
      invisible characters that defeat exact dedup silently.
    - ``collapse_whitespace``: runs of whitespace to one space + trim
      (off by default: it destroys document structure the line-based
      Gopher rules read).

    Scale shape: per-ROW Arrow kernel (``pandas_udf`` over stdlib
    ``unicodedata`` — no external model/lib), embarrassingly parallel,
    zero shuffle; composes with every downstream text operator. Python
    is unavoidable here (Spark has no unicode-normalize expression);
    Arrow batching keeps it off the row-at-a-time path. Deterministic:
    unicodedata implements the frozen Unicode normalization algorithm,
    so outputs are identical across partitionings and platforms
    (differential-tested against DuckDB's nfc_normalize).
    """
    import re as _re
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    # C0/C1 controls minus tab/LF/CR, plus zero-width & bidi marks
    ctrl = _re.compile(
        "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f"
        "\u200b\u200c\u200d\u200e\u200f\ufeff]"
    )
    ws = _re.compile(r"\s+")

    @pandas_udf("string")
    def _norm(s):  # pd.Series -> pd.Series (hints omitted: local import
        # of pandas makes string annotations unresolvable for pyspark's
        # type-hint inference)
        def one(x):
            if x is None:
                return None
            y = unicodedata.normalize(form, x)
            if strip_controls:
                y = ctrl.sub("", y)
            if collapse_whitespace:
                y = ws.sub(" ", y).strip()
            return y

        return s.map(one)

    return df.withColumn(out_col or text_col, _norm(F.col(text_col)))
