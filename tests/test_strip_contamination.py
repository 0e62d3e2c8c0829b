"""Surgical decontamination (decontam.py::strip_contamination): remove
only the contaminated n-gram spans, keep the document. Differential
against a transparent Python reference, plus the contract edges: byte-
identical passthrough for clean docs, case preservation in rewrites,
margin widening with left clamp, overlap union, full-strip to empty."""

import re

import pytest
from pyspark.sql import functions as F

from time_series_loader_spark.operators.decontam import (
    contaminated_positions,
    ngram_set,
    strip_contamination,
)

BENCH_TEXTS = ["the secret eval answer is forty two exactly so there"]
N = 8
BENCH = ngram_set(BENCH_TEXTS, N)

_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _ref_strip(text: str, bench: set, n: int, margin: int) -> str:
    raw = [t for t in _WS.split(text.strip()) if t]
    low = [t.lower() for t in raw]
    bad: set[int] = set()
    for i in range(len(low) - n + 1):
        if " ".join(low[i : i + n]) in bench:
            bad.update(range(max(0, i - margin), i + n + margin))
    if not bad:
        return text  # passthrough contract: untouched docs byte-identical
    return " ".join(t for j, t in enumerate(raw) if j not in bad)


DOCS = [
    # clean doc with weird whitespace -> must pass through byte-identical
    (0, "perfectly   clean\tdocument with  odd   spacing kept intact"),
    # contamination mid-doc, mixed case (detection is lowercase)
    (1, "Intro words here THE SECRET EVAL ANSWER IS FORTY TWO exactly so there and a tail that survives"),
    # exactly one contaminated window and nothing else -> empty string
    (2, "the secret eval answer is forty two exactly"),
    # overlapping windows (two shifted grams of the bench text)
    (3, "pad the secret eval answer is forty two exactly so there pad"),
    # shares a 7-gram but never a full 8-gram -> untouched
    (4, "the secret eval answer is forty two differs from here on out"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id LONG, text STRING")


@pytest.mark.parametrize("margin", [0, 2])
def test_strip_matches_python_reference(spark, corpus, margin):
    out = {
        r["doc_id"]: r["text"]
        for r in strip_contamination(
            corpus, "text", "doc_id", BENCH, n=N, margin=margin
        ).collect()
    }
    bench = set(BENCH)
    for doc_id, text in DOCS:
        assert out[doc_id] == _ref_strip(text, bench, N, margin), (doc_id, margin)


def test_contract_edges(spark, corpus):
    out = {
        r["doc_id"]: r["text"]
        for r in strip_contamination(corpus, "text", "doc_id", BENCH, n=N).collect()
    }
    # clean doc: original bytes, odd whitespace and all
    assert out[0] == DOCS[0][1]
    # mid-doc strip keeps the original-case survivors
    assert out[1].startswith("Intro words here") and out[1].endswith("survives")
    assert "SECRET" not in out[1]
    # fully contaminated -> empty string
    assert out[2] == ""
    # 7-gram-only overlap is NOT contamination at n=8
    assert out[4] == DOCS[4][1]
    # every doc comes back exactly once
    assert sorted(out) == [d for d, _ in DOCS]


def test_margin_widens_and_clamps(spark):
    # contamination at position 0: left margin must clamp, right must widen
    df = spark.createDataFrame(
        [(7, "the secret eval answer is forty two exactly tail1 tail2 tail3")],
        "doc_id LONG, text STRING",
    )
    pos0 = sorted(
        r["pos"]
        for r in contaminated_positions(df, "text", "doc_id", BENCH, n=N).collect()
    )
    pos2 = sorted(
        r["pos"]
        for r in contaminated_positions(
            df, "text", "doc_id", BENCH, n=N, margin=2
        ).collect()
    )
    assert pos0 == list(range(0, 8))
    assert pos2 == list(range(0, 10))  # clamped left at 0, +2 right
    out = {
        r["doc_id"]: r["text"]
        for r in strip_contamination(
            df, "text", "doc_id", BENCH, n=N, margin=2
        ).collect()
    }
    assert out[7] == "tail3"


def test_strip_vs_doc_level_decontaminate_retention(spark, corpus):
    """The point of the surgical form: doc-level decontamination at
    max_hits=0 would DROP docs 1-3 wholesale; the strip keeps their
    clean remainders (and loses nothing from clean docs)."""
    from time_series_loader_spark.operators.decontam import decontaminate

    dropped = {
        r["doc_id"]
        for r in decontaminate(corpus, "text", "doc_id", BENCH, n=N)
        .where(F.col("n_contam") > 0)
        .collect()
    }
    assert dropped == {1, 2, 3}
    kept_text = {
        r["doc_id"]: r["text"]
        for r in strip_contamination(corpus, "text", "doc_id", BENCH, n=N).collect()
    }
    # docs 1 and 3 retain usable text the doc-level policy would discard
    assert len(kept_text[1].split()) >= 8
    assert kept_text[3] == "pad pad"


@pytest.mark.parametrize("margin", [0, 3])
def test_expr_form_counts_equal_join_form_positions(spark, corpus, margin):
    """strip_count_expr (zero-join literal form, the gate's one-scan
    shape) must count exactly the positions contaminated_positions
    (broadcast-join scale form) enumerates — including the both-edge
    clamping margin forces near document boundaries."""
    from time_series_loader_spark.operators.decontam import strip_count_expr
    from time_series_loader_spark.operators.text import tokens

    expr_counts = {
        r["doc_id"]: r["n"]
        for r in corpus.select(
            "doc_id",
            tokens("text").alias("_toks"),
        )
        .select(
            "doc_id", strip_count_expr(F.col("_toks"), BENCH, n=N, margin=margin).alias("n")
        )
        .collect()
    }
    join_counts = {
        r["doc_id"]: r["n"]
        for r in contaminated_positions(
            corpus, "text", "doc_id", BENCH, n=N, margin=margin
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for doc_id, _ in DOCS:
        assert expr_counts[doc_id] == join_counts.get(doc_id, 0), (doc_id, margin)


def _strip_map(df, **kw):
    return {
        r["doc_id"]: r["text"]
        for r in strip_contamination(df, "text", "doc_id", **kw).collect()
    }


@pytest.mark.parametrize("margin", [0, 2])
def test_anchor_join_form_equals_literal_form(spark, corpus, margin):
    """r13 (VERDICT r12 #3): the broadcast-joined anchor table —
    the path suites past _ANCHOR_LITERAL_MAX take, where r12 silently
    dropped the prefilter — must enumerate exactly the literal form's
    positions. Forced via max_anchor_literals=0."""
    lit = {
        (r["doc_id"], r["pos"])
        for r in contaminated_positions(
            corpus, "text", "doc_id", BENCH, n=N, margin=margin
        ).collect()
    }
    joined = {
        (r["doc_id"], r["pos"])
        for r in contaminated_positions(
            corpus, "text", "doc_id", BENCH, n=N, margin=margin,
            max_anchor_literals=0,
        ).collect()
    }
    assert joined == lit


def test_ngram_dataframe_benchmark(spark, corpus):
    """A 1-column ngram frame as the benchmark (the real-eval-suite
    shape) takes the join-form prefilter and strips identically."""
    bng = spark.createDataFrame([(g,) for g in BENCH], "ngram string")
    assert _strip_map(corpus, benchmark=bng, n=N) == _strip_map(
        corpus, benchmark=BENCH, n=N
    )


def test_bench_df_entry_point(spark, corpus):
    """strip_contamination(bench_df=...) — parity with contamination's
    benchmark-TEXT-frame entry (VERDICT r12 #3)."""
    bdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(BENCH_TEXTS)], "doc_id LONG, text STRING"
    )
    assert _strip_map(corpus, bench_df=bdf, n=N) == _strip_map(
        corpus, benchmark=BENCH, n=N
    )
    with pytest.raises(ValueError, match="exactly one"):
        strip_contamination(corpus, "text", "doc_id", BENCH, n=N, bench_df=bdf)
    with pytest.raises(ValueError, match="exactly one"):
        strip_contamination(corpus, "text", "doc_id", n=N)


def test_strip_counts_dispatches_at_crossover(spark, corpus):
    """strip_counts (ADVICE r12): literal-expr and broadcast-join forms
    agree exactly at the forced crossover, and the raw expression form
    raises loudly instead of embedding an oversized literal."""
    from time_series_loader_spark.operators.decontam import (
        strip_count_expr,
        strip_counts,
    )
    from time_series_loader_spark.operators.text import tokens

    expr_form = {
        r["doc_id"]: r["n_strip"]
        for r in strip_counts(
            corpus, "text", "doc_id", BENCH, n=N, max_expr_ngrams=10_000
        ).collect()
    }
    join_form = {
        r["doc_id"]: r["n_strip"]
        for r in strip_counts(
            corpus, "text", "doc_id", BENCH, n=N, max_expr_ngrams=0
        ).collect()
    }
    assert expr_form == join_form
    assert any(v > 0 for v in expr_form.values())
    import time_series_loader_spark.operators.decontam as dmod

    orig = dmod.EXPR_FORM_MAX_NGRAMS
    dmod.EXPR_FORM_MAX_NGRAMS = 2
    try:
        with pytest.raises(ValueError, match="strip_counts"):
            corpus.select(strip_count_expr(tokens("text"), BENCH, n=N))
    finally:
        dmod.EXPR_FORM_MAX_NGRAMS = orig


def test_whitespace_contract_on_touched_docs(spark):
    """The rebuild contract, pinned (VERDICT r12 #6): UNTOUCHED docs
    pass through byte-identical whatever their whitespace; a TOUCHED
    doc is rebuilt from surviving tokens joined by single spaces, so
    its tab/multi-space runs normalize (the Dolma rewrite convention,
    documented in the docstring and shared with remove_repeated_spans).
    Token-position semantics are whitespace-run based on BOTH paths, so
    which tokens survive never depends on the whitespace flavor."""
    docs = [
        (10, "clean\tdoc  with \t odd\n whitespace stays byte identical"),
        (11, "keep1\tkeep2  the secret eval answer is forty two exactly so there\tkeep3   keep4"),
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    out = _strip_map(df, benchmark=BENCH, n=N)
    assert out[10] == docs[10 - 10][1]          # untouched: bytes preserved
    assert out[11] == "keep1 keep2 keep3 keep4"  # touched: single-spaced


def test_strip_counts_dataframe_benchmark_and_override(spark, corpus):
    """r13 review findings: strip_counts accepts an ngram DataFrame
    (always the join form) and honors an explicit max_expr_ngrams
    ABOVE the module crossover (the guard must not re-raise on an
    opted-in caller)."""
    import time_series_loader_spark.operators.decontam as dmod
    from time_series_loader_spark.operators.decontam import strip_counts

    list_form = {
        r["doc_id"]: r["n_strip"]
        for r in strip_counts(corpus, "text", "doc_id", BENCH, n=N).collect()
    }
    bng = spark.createDataFrame([(g,) for g in BENCH], "ngram string")
    df_form = {
        r["doc_id"]: r["n_strip"]
        for r in strip_counts(corpus, "text", "doc_id", bng, n=N).collect()
    }
    assert df_form == list_form
    orig = dmod.EXPR_FORM_MAX_NGRAMS
    dmod.EXPR_FORM_MAX_NGRAMS = 2  # below len(BENCH)
    try:
        opted_in = {
            r["doc_id"]: r["n_strip"]
            for r in strip_counts(
                corpus, "text", "doc_id", BENCH, n=N,
                max_expr_ngrams=10_000,  # explicit caller opt-in wins
            ).collect()
        }
    finally:
        dmod.EXPR_FORM_MAX_NGRAMS = orig
    assert opted_in == list_form
