"""Token-entropy quality signal (operators/text.py::token_entropy)."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from time_series_loader_spark.operators.text import token_entropy

DOCS = [
    (1, "a a a a a a"),  # degenerate: H = 0
    (2, "a b c d e f"),  # all distinct: H = ln(6)
    (3, "x x y y z z"),
    (4, "the quick brown fox the quick brown dog"),
    (5, "word"),  # single token: H = 0
]


def _ref_entropy(text):
    cts = Counter(text.lower().split())
    n = sum(cts.values())
    return math.log(n) - sum(c * math.log(c) for c in cts.values()) / n


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_float_path_matches_reference(docs_df):
    got = {
        r["doc_id"]: (r["entropy"], r["n_tokens"])
        for r in token_entropy(docs_df, "text", "doc_id").collect()
    }
    for i, t in DOCS:
        assert got[i][1] == len(t.split())
        # quantized-ln contributions: within a few µnats of the exact value
        assert got[i][0] == pytest.approx(_ref_entropy(t), abs=5e-6)
    assert got[1][0] == 0.0 and got[5][0] == 0.0
    assert got[2][0] == pytest.approx(math.log(6), abs=5e-6)


def test_pinned_integer_path_matches_reference(docs_df):
    got = {
        r["doc_id"]: r["entropy_u"]
        for r in token_entropy(
            docs_df, "text", "doc_id", pinned_ln=True, integer_outputs=True
        ).collect()
    }
    for i, t in DOCS:
        # ln_u rounds each lookup ≤0.5µ; the div floors once (<1µ)
        assert abs(got[i] - _ref_entropy(t) * 1e6) <= 3, (i, got[i])
    assert got[1] == 0 and got[5] == 0


def test_pinned_engine_agreement_and_partition_invariance(docs_df):
    a = sorted(
        (r["doc_id"], r["entropy_u"])
        for r in token_entropy(
            docs_df, "text", "doc_id", pinned_ln=True, integer_outputs=True
        ).collect()
    )
    b = sorted(
        (r["doc_id"], r["entropy_u"])
        for r in token_entropy(
            docs_df.repartition(7),
            "text",
            "doc_id",
            pinned_ln=True,
            integer_outputs=True,
        ).collect()
    )
    assert a == b
    # engine-ln integer path differs from pinned by ≤1µ per lookup pair
    c = {
        r["doc_id"]: r["entropy_u"]
        for r in token_entropy(
            docs_df, "text", "doc_id", integer_outputs=True
        ).collect()
    }
    for i, v in a:
        assert abs(c[i] - v) <= 2


def test_low_entropy_flags_repetitive_doc(docs_df):
    got = {
        r["doc_id"]: r["entropy"]
        for r in token_entropy(docs_df, "text", "doc_id").collect()
    }
    assert got[1] < got[3] < got[2]


def test_pinned_domain_guard_raises_before_lossy_join(spark):
    """ADVICE r7 (medium): a doc whose token count exceeds the pinned
    ln table's 8e6 domain must raise LOUDLY — the old guard checked
    max(n) AFTER the inner lookup join had already dropped the
    out-of-domain (doc, term) rows, so the doc silently vanished (or
    its entropy deflated) instead of failing."""
    import pytest

    from time_series_loader_spark.operators.ln_pinned import LN_U_MAX_K
    from time_series_loader_spark.operators.text import token_entropy

    big = "a " * (LN_U_MAX_K + 1)
    df = spark.createDataFrame([(1, big), (2, "b c d")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="pinned domain"):
        token_entropy(
            df, "text", "doc_id", pinned_ln=True, integer_outputs=True
        ).collect()
