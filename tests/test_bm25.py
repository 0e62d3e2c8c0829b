"""BM25 scoring + inverted index (operators/bm25.py).

Differential strategy: a tiny plain-Python BM25 reference (the textbook
Robertson formula in floats) must agree with BOTH engine paths — the
float path to ~1e-9, the pinned integer path in RANK and to < n_terms
micro-units in score (the per-term floor loses < 1 µunit each).
"""

import math

import pytest
from pyspark.sql import functions as F

from time_series_loader_spark.operators.bm25 import bm25_scores, inverted_index

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick quick fox"),
    (3, "lorem ipsum dolor sit amet"),
    (4, "a lazy dog and a lazy cat sleep"),
    (5, "fox fox fox fox fox"),
    (6, ""),
]
QUERY = ["fox", "lazy", "missingterm"]


def _ref_bm25(docs, query, k1=1.2, b=0.75):
    """Plain-Python textbook BM25 (floats)."""
    toks = {i: t.lower().split() for i, t in docs}
    lens = {i: len(v) for i, v in toks.items() if v}
    n = len(docs)  # empty docs still count toward N (same as the operator)
    total = sum(lens.values())
    avgdl = total / n
    out = {}
    for term in {q.lower() for q in query}:
        df = sum(1 for v in toks.values() if term in v)
        if df == 0:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for i, v in toks.items():
            tf = v.count(term)
            if tf == 0:
                continue
            s = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * lens[i] / avgdl))
            sc, nm = out.get(i, (0.0, 0))
            out[i] = (sc + s, nm + 1)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_float_path_matches_reference(docs_df):
    got = {
        r["doc_id"]: (r["score"], r["n_terms_matched"])
        for r in bm25_scores(docs_df, "text", "doc_id", QUERY).collect()
    }
    ref = _ref_bm25(DOCS, QUERY)
    assert set(got) == set(ref)
    for i in ref:
        assert got[i][1] == ref[i][1]
        assert got[i][0] == pytest.approx(ref[i][0], abs=1e-9)


def test_pinned_path_matches_reference_in_micro_units(docs_df):
    got = {
        r["doc_id"]: (r["score_u"], r["n_terms_matched"])
        for r in bm25_scores(
            docs_df, "text", "doc_id", QUERY, pinned_ln=True
        ).collect()
    }
    ref = _ref_bm25(DOCS, QUERY)
    assert set(got) == set(ref)
    for i in ref:
        nm = ref[i][1]
        # each matched term floors once (<1µ) + pinned idf rounds once (≤0.5µ·tf-term weight ≤ 2.2)
        assert abs(got[i][0] - ref[i][0] * 1e6) < nm * 4, (i, got[i], ref[i])
        assert got[i][1] == nm


def test_pinned_rank_is_deterministic_and_matches_float_rank(docs_df):
    f = bm25_scores(docs_df, "text", "doc_id", QUERY, top_k=3).collect()
    p = bm25_scores(
        docs_df, "text", "doc_id", QUERY, pinned_ln=True, top_k=3
    ).collect()
    assert [r["doc_id"] for r in f] == [r["doc_id"] for r in p]
    # repartition invariance of the integer path
    p2 = bm25_scores(
        docs_df.repartition(7), "text", "doc_id", QUERY, pinned_ln=True, top_k=3
    ).collect()
    assert [(r["doc_id"], r["score_u"]) for r in p] == [
        (r["doc_id"], r["score_u"]) for r in p2
    ]


def test_query_term_normalization_and_errors(docs_df, spark):
    up = bm25_scores(docs_df, "text", "doc_id", ["FOX"], pinned_ln=True).collect()
    lo = bm25_scores(docs_df, "text", "doc_id", ["fox"], pinned_ln=True).collect()
    assert sorted((r["doc_id"], r["score_u"]) for r in up) == sorted(
        (r["doc_id"], r["score_u"]) for r in lo
    )
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(docs_df, "text", "doc_id", [])
    with pytest.raises(ValueError, match="k1=1.2"):
        bm25_scores(docs_df, "text", "doc_id", ["fox"], k1=2.0, pinned_ln=True)
    empty = spark.createDataFrame([(1, " ")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="no tokens"):
        # a single whitespace-only doc: D=1, T=0 (phantom '' token excluded)
        bm25_scores(empty, "text", "doc_id", ["x"])


def test_inverted_index_postings(docs_df):
    rows = {r["term"]: r for r in inverted_index(docs_df, "text", "doc_id").collect()}
    assert rows["fox"]["postings"] == "1:1,2:1,5:5"
    assert rows["fox"]["df"] == 3 and rows["fox"]["ct"] == 7
    assert rows["lazy"]["postings"] == "1:1,4:2"
    assert rows["the"]["df"] == 2 and rows["the"]["ct"] == 3
    # min_df pruning drops hapaxes without touching surviving rows
    pruned = {
        r["term"]: r["postings"]
        for r in inverted_index(docs_df, "text", "doc_id", min_df=2).collect()
    }
    assert "lorem" not in pruned and pruned["fox"] == "1:1,2:1,5:5"


def test_positional_index_and_phrase_match(docs_df, spark):
    from time_series_loader_spark.operators.bm25 import (
        inverted_index,
        phrase_match,
    )

    rows = {
        r["term"]: r
        for r in inverted_index(
            docs_df, "text", "doc_id", positional=True
        ).collect()
    }
    # doc 1: "the quick brown fox jumps over the lazy dog" — 'the' at 0, 6
    assert rows["the"]["postings"] == "1:0|6,2:0"
    assert rows["fox"]["postings"] == "1:3,2:3,5:0|1|2|3|4"
    assert rows["the"]["df"] == 2 and rows["the"]["ct"] == 3
    # positional and tf forms agree on df/ct for every term
    tf_rows = {
        r["term"]: r for r in inverted_index(docs_df, "text", "doc_id").collect()
    }
    assert set(rows) == set(tf_rows)
    for t in rows:
        assert (rows[t]["df"], rows[t]["ct"]) == (tf_rows[t]["df"], tf_rows[t]["ct"])

    hits = {
        r["doc_id"]: r["n_hits"]
        for r in phrase_match(docs_df, "text", "doc_id", "the quick").collect()
    }
    assert hits == {1: 1, 2: 1}
    # overlapping self-repeat: "fox fox fox fox fox" has 4 bigram hits
    hits2 = {
        r["doc_id"]: r["n_hits"]
        for r in phrase_match(docs_df, "text", "doc_id", "fox fox").collect()
    }
    assert hits2 == {5: 4}
    # 3-term phrase and a no-hit phrase
    hits3 = {
        r["doc_id"]: r["n_hits"]
        for r in phrase_match(
            docs_df, "text", "doc_id", "quick brown fox"
        ).collect()
    }
    assert hits3 == {1: 1}
    assert phrase_match(docs_df, "text", "doc_id", "dog sleeps here").count() == 0
    with pytest.raises(ValueError, match="token"):
        phrase_match(docs_df, "text", "doc_id", "   ")


def test_update_inverted_index_equals_full_rebuild(docs_df, spark):
    from time_series_loader_spark.operators.bm25 import update_inverted_index

    old_docs = docs_df.where(F.col("doc_id") <= 3)
    new_docs = docs_df.where(F.col("doc_id") > 3)  # append-only ids
    incr = update_inverted_index(
        inverted_index(old_docs, "text", "doc_id"), new_docs, "text", "doc_id"
    )
    full = inverted_index(docs_df, "text", "doc_id")
    assert sorted(map(tuple, incr.collect())) == sorted(map(tuple, full.collect()))
    # merging an empty batch is the identity
    empty = new_docs.where(F.lit(False))
    ident = update_inverted_index(
        inverted_index(docs_df, "text", "doc_id"), empty, "text", "doc_id"
    )
    assert sorted(map(tuple, ident.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_inverted_index_partition_invariance(docs_df):
    a = sorted(
        (r["term"], r["postings"])
        for r in inverted_index(docs_df, "text", "doc_id").collect()
    )
    b = sorted(
        (r["term"], r["postings"])
        for r in inverted_index(docs_df.repartition(5), "text", "doc_id").collect()
    )
    assert a == b
