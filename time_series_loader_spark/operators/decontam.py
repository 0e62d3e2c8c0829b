"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation benchmark set.

Beyond-reference capability (BASELINE.json north star): the standard
pretraining-pipeline step that keeps eval prompts/answers out of the
training corpus (GPT-3 §C / PaLM / Llama style: exact n-gram collision
against the benchmark, n chosen large enough — typically 8-13 words —
that a hit means real contamination, not shared phrasing).

Two forms, chosen by benchmark size:

- :func:`contamination` — the scale path. Benchmark n-grams become a
  DataFrame that is **broadcast**; each doc's distinct n-grams
  (Arrow-kernel shingles, see ``dedup.shingle_arrays``) semi-join against
  it map-side, so only HIT n-grams enter the per-doc count shuffle. At
  100 TB the corpus side stays partitioned; the benchmark side is
  eval-suite-sized (thousands of prompts → at most a few million
  n-grams) and ships once per executor.
- :func:`contamination_expr` — the zero-join path for small benchmark
  sets (≤ a few thousand n-grams): the set rides the plan as an array
  literal and the per-doc hit count is one ``array_intersect`` in an
  existing projection — no extra scan, no join, no shuffle. This is how
  the flagship ``corpus_filter`` pipeline embeds decontamination without
  giving up its one-scan shape.

Tokenization matches ``text.tokens`` exactly (lowercase, trim, split on
Java ``\\s`` runs) in both the Spark expressions and the driver-side
helper, so flags are engine-reproducible.
"""

from __future__ import annotations

import re
from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from time_series_loader_spark.operators.dedup import shingle_table
from time_series_loader_spark.operators.text import tokens

# Java \s (what F.split uses), NOT python \s (which adds unicode spaces)
_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def ngram_set(texts: Iterable[str | None], n: int = 8) -> list[str]:
    """Driver-side distinct word n-grams of a small text collection,
    token-for-token identical to the Spark shingle expressions — for
    building literal benchmark sets from an eval suite."""
    out: set[str] = set()
    for s in texts:
        if not s:
            continue
        t = _WS.split(s.strip().lower())
        out.update(" ".join(t[i : i + n]) for i in range(len(t) - n + 1))
    return sorted(out)


def benchmark_ngrams(
    bench_df: DataFrame, text_col: str, id_col: str, n: int = 8
) -> DataFrame:
    """Distinct n-grams of the benchmark set as a 1-column ``ngram`` frame."""
    return (
        shingle_table(bench_df, text_col, id_col, n)
        .select(F.col("shingle").alias("ngram"))
        .distinct()
    )


def contamination(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bench_df: DataFrame,
    bench_text_col: str = "text",
    bench_id_col: str | None = None,
    n: int = 8,
) -> DataFrame:
    """Per-doc contamination counts against a benchmark DataFrame.

    Returns the input plus ``n_contam`` = number of the doc's DISTINCT
    n-grams that appear anywhere in the benchmark set (0 = clean).
    Broadcast semi-join shape: non-hit n-grams die map-side; the count
    shuffle carries only (id, hit) rows.
    """
    bng = benchmark_ngrams(bench_df, bench_text_col, bench_id_col or id_col, n)
    sh = shingle_table(df, text_col, id_col, n)
    hits = (
        sh.join(F.broadcast(bng), sh["shingle"] == bng["ngram"])
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contam"))
    )
    return df.join(hits, id_col, "left").withColumn(
        "n_contam", F.coalesce(F.col("n_contam"), F.lit(0)).cast("long")
    )


def contamination_expr(
    toks: Column, benchmark: Sequence[str], n: int = 8
) -> Column:
    """Hit count as a pure Column over a pre-tokenized array — the
    zero-join form for literal benchmark sets. ``toks`` MUST be a
    materialized ``tokens(text)`` column (see text._quality_exprs on why
    pre-tokenizing matters).

    Shingles are built with ``transform(sequence, i -> array_join(
    slice(toks, i, n)))`` rather than ``dedup._shingles_of``'s zip_with
    chain: over a materialized ATTRIBUTE the lambda only slices (no
    re-evaluation of the tokenizer, which is what makes the inline form
    quadratic), and it measured 2× faster than the n-1 chained zip_with
    passes at n=8 (0.92 s vs 1.93 s over 5k docs).
    """
    if not benchmark:
        return F.lit(0).cast("long")
    bench_arr = F.array(*[F.lit(s) for s in sorted(set(benchmark))])
    m = F.size(toks) - (n - 1)
    shingles = F.when(
        m >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.size(F.array_intersect(shingles, bench_arr)).cast("long")


def contamination_expr_text(
    text: Column | str, benchmark: Sequence[str], n: int = 8
) -> Column:
    """Convenience wrapper tokenizing inline (single-use projections)."""
    return contamination_expr(tokens(text), benchmark, n)


def strip_count_expr(
    toks: Column, benchmark: Sequence[str], n: int = 8, margin: int = 0
) -> Column:
    """How many token positions :func:`strip_contamination` would remove
    — as a pure Column over a pre-tokenized array (the zero-join literal
    form, the `contamination_expr` counterpart for the SURGICAL policy).
    Position arithmetic is identical to :func:`contaminated_positions`:
    distinct 0-based positions covered by any benchmark-colliding window
    ± ``margin`` (left-clamped at 0; the right edge cannot overflow —
    the last window ends at the last token, so only ``margin`` > 0 needs
    the least() clamp applied here for exact parity with the join form's
    count).

    CSE discipline: the O(m·n) gram array and the hit intersect are
    let-bound via single-element transform() wrappers (Catalyst does no
    CSE inside HOF arguments — the known O(m²) trap), so each evaluates
    once per row; the per-window work is an array index plus a contains
    against the (usually tiny) hit set."""
    if not benchmark:
        return F.lit(0).cast("long")
    bench_arr = F.array(*[F.lit(s) for s in sorted(set(benchmark))])
    m = F.size(toks) - (n - 1)
    grams = F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    last_pos = F.size(toks) - 1  # right clamp for margin widening

    def with_hits(garr, harr):
        covered = F.array_distinct(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.size(garr), F.lit(1))),
                    lambda i: F.when(
                        F.array_contains(harr, F.element_at(garr, i)),
                        F.sequence(
                            F.greatest(i - 1 - margin, F.lit(0)),
                            F.least(i - 1 + (n - 1) + margin, last_pos),
                        ),
                    ).otherwise(F.array().cast("array<int>")),
                )
            )
        )
        return F.when(F.size(garr) >= 1, F.size(covered)).otherwise(F.lit(0))

    return F.element_at(
        F.transform(
            F.array(grams),
            lambda garr: F.element_at(
                F.transform(
                    F.array(F.array_intersect(F.array_distinct(garr), bench_arr)),
                    lambda harr: with_hits(garr, harr),
                ),
                1,
            ),
        ),
        1,
    ).cast("long")


# Anchor-prefilter cap: the distinct FIRST tokens of the benchmark grams
# ride the plan as an array literal (contaminated_positions); past this
# many entries the literal bloats codegen like any oversized literal
# (see EXPR_FORM_MAX_NGRAMS below) and the prefilter is skipped.
_ANCHOR_LITERAL_MAX = 5000

# Crossover between the literal-array form and the broadcast-join form.
# The expr form embeds every benchmark n-gram as a Literal in each task's
# codegen: past a few thousand entries, Catalyst analysis time, the
# serialized plan shipped with every task, and the O(|bench|) per-doc
# sorted-array intersect all grow linearly, and Janino falls back to
# interpreted mode on oversized methods. 5000 n-grams ≈ a few hundred KB
# of literals — comfortably under those cliffs; real eval suites
# (thousands of prompts → up to millions of 8-grams) take the broadcast
# path.
EXPR_FORM_MAX_NGRAMS = 5000


def contamination_from_ngrams(
    df: DataFrame,
    text_col: str,
    id_col: str,
    benchmark: Sequence[str],
    n: int = 8,
    count_col: str = "n_contam",
) -> DataFrame:
    """Broadcast-join contamination count against a driver-side n-gram
    list (the :func:`contamination` shape, but for callers that already
    hold the benchmark as n-grams rather than as a DataFrame of texts).
    The benchmark ships once per executor as a broadcast; non-hit
    n-grams die map-side, so the count shuffle carries only (id, hit)
    rows and the corpus side never reshuffles."""
    spark = df.sparkSession
    bng = spark.createDataFrame(
        [(g,) for g in sorted(set(benchmark))], "ngram string"
    )
    sh = shingle_table(df, text_col, id_col, n)
    hits = (
        sh.join(F.broadcast(bng), sh["shingle"] == bng["ngram"])
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias(count_col))
    )
    return df.join(hits, id_col, "left").withColumn(
        count_col, F.coalesce(F.col(count_col), F.lit(0)).cast("long")
    )


def decontaminate(
    df: DataFrame,
    text_col: str,
    id_col: str,
    benchmark: Sequence[str],
    n: int = 8,
    count_col: str = "n_contam",
    toks_col: str | None = None,
    max_expr_ngrams: int | None = None,
) -> DataFrame:
    """Form dispatcher: adds ``count_col`` (long) = how many of the doc's
    distinct word n-grams appear in ``benchmark``.

    Picks the zero-join literal-array expression
    (:func:`contamination_expr`) while the benchmark fits
    ``max_expr_ngrams``, else the broadcast semi-join
    (:func:`contamination_from_ngrams`). Both forms are equality-tested
    at the crossover (tests/test_decontam.py); nothing but plan shape
    changes at the boundary.

    ``toks_col``: name of a pre-materialized ``tokens(text)`` array
    column, if the caller already tokenized (expr form only — the
    broadcast form's Arrow kernel tokenizes from the raw text).
    ``max_expr_ngrams=None`` (default) reads ``EXPR_FORM_MAX_NGRAMS`` at
    call time, so tests can force either form module-wide.
    """
    if max_expr_ngrams is None:
        max_expr_ngrams = EXPR_FORM_MAX_NGRAMS
    if len(benchmark) <= max_expr_ngrams:
        toks = F.col(toks_col) if toks_col else tokens(text_col)
        return df.withColumn(
            count_col, contamination_expr(toks, benchmark, n)
        )
    return contamination_from_ngrams(
        df, text_col, id_col, benchmark, n, count_col
    )


def contaminated_positions(
    df: DataFrame,
    text_col: str,
    id_col: str,
    benchmark: Sequence[str],
    n: int = 8,
    margin: int = 0,
) -> DataFrame:
    """(``id_col``, pos): the 0-based whitespace-token positions covered
    by ANY word n-gram present in ``benchmark``, each hit window widened
    by ``margin`` tokens on both sides, clamped to the document on both
    edges (so the position COUNT agrees exactly with
    :func:`strip_count_expr`, the zero-join literal form).
    Broadcast-join form, the scale path: positional windows are
    corpus-sized but non-hit windows die map-side against the broadcast
    benchmark, so the position explode and distinct run only on hits —
    contamination-sized, not corpus-sized."""
    spark = df.sparkSession
    bng = spark.createDataFrame(
        [(g,) for g in sorted(set(benchmark))], "ngram string"
    )
    toked = df.select(F.col(id_col), tokens(text_col).alias("_t"))
    m = F.size("_t") - (n - 1)
    # ANCHOR prefilter (r12 probe finding): building every window's
    # n-token gram string is the corpus-sized cost term (~2.3 GB of
    # strings per 200k 120-token docs — the 45 s baseline in
    # tools/strip_probe.py). A window can only hit the benchmark if its
    # FIRST token is some benchmark gram's first token, so gram strings
    # are built ONLY at those anchor positions — exact, not heuristic.
    # The anchor set is vocabulary-of-first-tokens-sized (≪ |benchmark|);
    # past _ANCHOR_LITERAL_MAX it would bloat codegen, so huge suites
    # skip the prefilter and keep the plain scan.
    firsts = sorted({g.split(" ", 1)[0] for g in benchmark})
    anchors_ok = 0 < len(firsts) <= _ANCHOR_LITERAL_MAX
    if anchors_ok:
        first_arr = F.array(*[F.lit(t) for t in firsts])
        idxs = F.filter(
            F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
            lambda i: F.array_contains(first_arr, F.element_at(F.col("_t"), i)),
        )
    else:
        idxs = F.sequence(F.lit(1), F.greatest(m, F.lit(1)))
    win = F.when(
        m >= 1,
        F.transform(
            idxs,
            lambda i: F.struct(
                (i - 1).cast("int").alias("start"),
                F.concat_ws(" ", F.slice(F.col("_t"), i, n)).alias("gram"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<start:int,gram:string>>"))
    wins = toked.select(
        F.col(id_col),
        F.explode(win).alias("w"),
        (F.size("_t") - 1).alias("_last"),
    ).select(id_col, "w.start", "w.gram", "_last")
    hits = wins.join(
        F.broadcast(bng), wins["gram"] == bng["ngram"], "inner"
    ).select(id_col, "start", "_last")
    # both edges clamp to the document (margin can overflow either way);
    # strip_count_expr clamps identically so the two forms COUNT alike
    return hits.select(
        F.col(id_col),
        F.explode(
            F.sequence(
                F.greatest(F.col("start") - margin, F.lit(0)),
                F.least(F.col("start") + (n - 1) + margin, F.col("_last")),
            )
        ).alias("pos"),
    ).distinct()


def strip_contamination(
    df: DataFrame,
    text_col: str,
    id_col: str,
    benchmark: Sequence[str],
    n: int = 8,
    margin: int = 0,
) -> DataFrame:
    """SURGICAL decontamination: rewrite each document with the
    contaminated spans removed instead of dropping the whole document —
    the Dolma/RefinedWeb-style alternative to :func:`decontaminate`'s
    doc-level drop, for corpora where benchmark n-grams are embedded in
    otherwise-good documents (quotations, shared boilerplate around an
    eval prompt) and whole-doc removal wastes data.

    Every token position covered by a benchmark-colliding n-gram window
    (± ``margin`` tokens) is removed; overlapping hits union naturally
    (removal is by position). Untouched documents pass through
    byte-identical; touched documents are rebuilt from the surviving
    original-case tokens joined by single spaces; fully-contaminated
    documents come back as empty strings (filter on
    ``length(text) > 0`` to drop them). Output: (``id_col``,
    ``text_col``) — same reattach contract as
    `spans.remove_repeated_spans`.

    Detection tokenizes lowercase (`text.tokens`, matching every other
    decontamination form); the rewrite splits the RAW text — positions
    align because lowercasing never moves whitespace.

    Scale shape: one corpus-sized projection builds positional windows;
    the broadcast benchmark kills non-hits map-side, so everything
    after the join (position explode, distinct, the rebuild's
    posexplode/anti-join over TOUCHED docs only) is sized by the
    contamination, not the corpus. No corpus-sized shuffle beyond the
    per-doc rebuild of touched documents.
    """
    from time_series_loader_spark.operators.spans import (
        rebuild_without_positions,
    )

    bad_pos = contaminated_positions(df, text_col, id_col, benchmark, n, margin)
    return rebuild_without_positions(
        df.select(id_col, text_col), text_col, id_col, bad_pos
    )
