"""DSIR importance weighting (operators/dsir.py) vs a pure-Python
reference implementation of Xie et al. 2023's hashed-n-gram log-ratio."""

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from time_series_loader_spark.operators.dsir import (
    dsir_score,
    hashed_ngram_counts,
)
from time_series_loader_spark.operators.ln_pinned import ln_u_lookup

B = 512


def _py_tokens(text):
    return re.split(r"\s+", (text or "").strip().lower())


def _py_feats(text):
    t = _py_tokens(text)
    return t + [f"{a} {b}" for a, b in zip(t, t[1:])]


def _bucket(feat):
    return int(hashlib.md5(feat.encode()).hexdigest()[:4], 16) % B


def _py_dsir(rows, target_ids, ln=None):
    """rows: [(id, text)]; returns {id: (n_feats, score_u)} using either
    the pinned lookup (ln=None → ln_u_lookup, exact ints) or a float ln."""
    ln = ln or (lambda k: ln_u_lookup(k))
    per_doc = {i: [_bucket(f) for f in _py_feats(t)] for i, t in rows}
    ct, cr = {}, {}
    for i, bks in per_doc.items():
        for b in bks:
            cr[b] = cr.get(b, 0) + 1
            if i in target_ids:
                ct[b] = ct.get(b, 0) + 1
    nt, nr = sum(ct.values()), sum(cr.values())
    lam = {
        b: (ln(ct.get(b, 0) + 1) - ln(nt + B)) - (ln(cr[b] + 1) - ln(nr + B))
        for b in cr
    }
    return {
        i: (len(bks), sum(lam[b] for b in bks)) for i, bks in per_doc.items()
    }


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox"),
    (2, "der schnelle braune fuchs springt"),
    (3, "le renard brun rapide saute"),
    (4, "the the the the"),
    (5, "x"),
    (6, ""),
    (7, "completely different vocabulary entirely here"),
]
TARGET = {0, 1, 4}


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_pinned_matches_python_exactly(spark, docs_df):
    out = dsir_score(
        docs_df, "text", "doc_id", F.col("doc_id").isin(*TARGET),
        n_buckets=B, pinned_ln=True, integer_outputs=True,
    ).collect()
    ref = _py_dsir(DOCS, TARGET)
    assert len(out) == len(DOCS)
    for r in out:
        n, s = ref[r["doc_id"]]
        assert (r["n_feats"], r["score_u"]) == (n, s), r["doc_id"]


def test_engine_ln_close_to_pinned(spark, docs_df):
    """The unbounded-scale engine-ln path agrees with the pinned path to
    ≤1 µunit per feature occurrence (one extra rounding per lam term)."""
    pin = {
        r["doc_id"]: r["score_u"]
        for r in dsir_score(
            docs_df, "text", "doc_id", F.col("doc_id").isin(*TARGET),
            n_buckets=B, pinned_ln=True, integer_outputs=True,
        ).collect()
    }
    eng = {
        r["doc_id"]: r["score_u"]
        for r in dsir_score(
            docs_df, "text", "doc_id", F.col("doc_id").isin(*TARGET),
            n_buckets=B, pinned_ln=False, integer_outputs=True,
        ).collect()
    }
    ref = _py_dsir(DOCS, TARGET)
    for i, (n, _) in ref.items():
        assert abs(pin[i] - eng[i]) <= 4 * max(n, 1)


def test_target_docs_score_higher(spark, docs_df):
    out = {
        r["doc_id"]: r["score_u"] / max(r["n_feats"], 1)
        for r in dsir_score(
            docs_df, "text", "doc_id", F.col("doc_id").isin(*TARGET),
            n_buckets=B, pinned_ln=True, integer_outputs=True,
        ).collect()
    }
    tgt = [out[i] for i in TARGET]
    other = [out[i] for i in out if i not in TARGET]
    assert min(tgt) > sum(other) / len(other)


def test_no_target_docs_degenerates_gracefully(spark, docs_df):
    out = dsir_score(
        docs_df, "text", "doc_id", F.lit(False),
        n_buckets=B, pinned_ln=True, integer_outputs=True,
    ).collect()
    ref = _py_dsir(DOCS, set())
    for r in out:
        assert r["score_u"] == ref[r["doc_id"]][1]


def test_hashed_counts_cover_all_features(spark, docs_df):
    dbc = hashed_ngram_counts(docs_df, "text", "doc_id", n_buckets=B)
    got = {
        r["doc_id"]: r["n"]
        for r in dbc.groupBy("doc_id").agg(F.sum("c").alias("n")).collect()
    }
    for i, t in DOCS:
        assert got[i] == len(_py_feats(t)), (i, t)


def test_single_token_doc_has_no_bigrams(spark):
    df = spark.createDataFrame([(0, "solo")], "doc_id long, text string")
    n = hashed_ngram_counts(df, "text", "doc_id", n_buckets=B).agg(
        F.sum("c")
    ).collect()[0][0]
    assert n == 1


def test_float_outputs_match_micro_units(spark, docs_df):
    pin = dsir_score(
        docs_df, "text", "doc_id", F.col("doc_id").isin(*TARGET),
        n_buckets=B, pinned_ln=True, integer_outputs=True,
    ).collect()
    flt = {
        r["doc_id"]: r["score"]
        for r in dsir_score(
            docs_df, "text", "doc_id", F.col("doc_id").isin(*TARGET),
            n_buckets=B, pinned_ln=True,
        ).collect()
    }
    for r in pin:
        assert flt[r["doc_id"]] == pytest.approx(r["score_u"] / 1e6)
