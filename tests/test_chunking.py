"""chunk_documents (operators/chunking.py): overlapping token windows.

Covers: pure-python HF-stride reference differential on the real
documents table, window-arithmetic edge cases (empty doc, doc shorter
than one window, exact multiples, zero overlap), coverage invariants
(every token covered, first window at 0, last window reaches the end,
consecutive starts differ by the stride), argument validation, and a
plan guard proving the operator is shuffle-free.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from time_series_loader_spark.operators.chunking import chunk_documents
from time_series_loader_spark.session import get_spark, read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-chunking")


@pytest.fixture(scope="module")
def docs(spark):
    return read_table(spark, SF, "documents")


def engine_tokens(text):
    """Match text.tokens exactly: split(lower(trim(s)), '\\s+') — note
    an empty/whitespace-only string yields [''] (one empty token), the
    engine-wide convention on both Spark and DuckDB."""
    return re.split(r"\s+", text.strip().lower())


def py_reference(toks, c, o):
    """HF return_overflowing_tokens/stride semantics in plain python."""
    s = c - o
    n = len(toks)
    if n == 0:
        return []
    out = []
    i = 0
    while True:
        start = i * s
        out.append((i, start, min(c, n - start), " ".join(toks[start : start + c])))
        if start + c >= n:
            break
        i += 1
    return out


def test_differential_vs_python(spark, docs):
    c, o = 64, 16
    got = {
        (r["doc_id"], r["chunk_id"]): (
            r["start_tok"],
            r["n_chunk_tok"],
            r["chunk_text"],
        )
        for r in chunk_documents(docs, "doc_id", c, o).collect()
    }
    want = {}
    for r in docs.select("doc_id", "text").collect():
        toks = engine_tokens(r["text"])
        for cid, start, ln, txt in py_reference(toks, c, o):
            want[(r["doc_id"], cid)] = (start, ln, txt)
    assert got == want and len(got) > 0


@pytest.mark.parametrize("n,c,o", [(0, 4, 0), (1, 4, 0), (3, 4, 2), (4, 4, 2),
                                   (5, 4, 2), (8, 4, 0), (9, 4, 0), (10, 4, 3)])
def test_window_arithmetic_edges(spark, n, c, o):
    toks = [f"t{i}" for i in range(n)]
    df = spark.createDataFrame([(1, toks)], "doc_id long, tk array<string>")
    got = [
        (r["chunk_id"], r["start_tok"], r["n_chunk_tok"], r["chunk_text"])
        for r in chunk_documents(df, "doc_id", c, o, text_col=None, tok_col="tk")
        .orderBy("chunk_id")
        .collect()
    ]
    want = py_reference(toks, c, o)
    assert got == want


def test_coverage_invariants(spark, docs):
    c, o = 32, 8
    s = c - o
    rows = chunk_documents(docs, "doc_id", c, o).collect()
    n_tok = {
        r["doc_id"]: len(engine_tokens(r["text"]))
        for r in docs.select("doc_id", "text").collect()
    }
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        assert chunks[0]["start_tok"] == 0
        last = chunks[-1]
        assert last["start_tok"] + c >= n_tok[doc_id]
        assert last["start_tok"] + last["n_chunk_tok"] == n_tok[doc_id]
        for a, b in zip(chunks, chunks[1:]):
            assert b["start_tok"] - a["start_tok"] == s
            # no window except the last reaches the end
            assert a["start_tok"] + c < n_tok[doc_id]


def test_tok_col_bypass(spark):
    df = spark.createDataFrame(
        [(1, ["A", "b", "C"])], "doc_id long, tk array<string>"
    )
    got = chunk_documents(df, "doc_id", 2, 1, text_col=None, tok_col="tk").collect()
    # caller's tokens are used verbatim (no lowering/splitting)
    assert [(r["chunk_id"], r["chunk_text"]) for r in sorted(got, key=lambda r: r["chunk_id"])] == [
        (0, "A b"),
        (1, "b C"),
    ]


@pytest.mark.parametrize("c,o", [(0, 0), (-1, 0), (4, 4), (4, 5), (4, -1)])
def test_validation(spark, docs, c, o):
    with pytest.raises(ValueError):
        chunk_documents(docs, "doc_id", c, o)


def test_plan_is_shuffle_free(spark, docs):
    plan = chunk_documents(docs, "doc_id", 64, 16)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
