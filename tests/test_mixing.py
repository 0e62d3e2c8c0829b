"""mixture_plan (operators/mixing.py): per-domain epoch mixing.

Covers: pure-python greedy reference differential, window ≡ hist mode
bit-equality (the scale path must be EXACTLY the oracle path), budget
accounting invariants (full epochs + maximal greedy prefix, never over
budget), partition-order invariance, and argument validation.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from time_series_loader_spark.operators.mixing import (
    _domain_budgets,
    mixture_plan,
)
from time_series_loader_spark.session import get_spark, read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-mixing")


@pytest.fixture(scope="module")
def docs(spark):
    return read_table(spark, SF, "documents")


W = {"en": 50, "de": 15, "fr": 15, "es": 10, "zh": 10}


def py_reference(rows, weights, budget, salt=""):
    """Greedy mixing plan in plain python: rows = [(id, domain, toks)]."""
    budgets = {d: (budget * w) // sum(weights.values()) for d, w in weights.items()}
    by_dom: dict = {}
    for i, d, t in rows:
        by_dom.setdefault(d, []).append((i, t))
    out = {}
    for d, members in by_dom.items():
        nd = budgets.get(d, 0)
        total = sum(t for _, t in members)
        q, rem = nd // total, nd % total
        cum = 0
        for i, t in sorted(
            members,
            key=lambda it: (hashlib.md5((str(it[0]) + salt).encode()).hexdigest(), it[0]),
        ):
            cum += t
            out[i] = q + (1 if cum <= rem else 0)
    return out


def plan_dict(df):
    return {r[0]: (r[1], r[2], r[3]) for r in df.collect()}


def test_python_differential_window_and_hist(spark):
    rows = [(i, ["a", "b", "c"][i % 3], 1 + (i * 7) % 23) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, dom string, toks long")
    weights, budget = {"a": 3, "b": 1, "c": 6}, 1700
    exp = py_reference(rows, weights, budget)
    for mode in ("window", "hist"):
        got = {
            r["doc_id"]: r["n_copies"]
            for r in mixture_plan(
                df, "dom", "doc_id", weights, budget, tok_col="toks", mode=mode
            ).collect()
        }
        assert got == exp, mode


@pytest.mark.parametrize("budget", [0, 1, 5_000, 50_000, 10_000_000])
def test_window_hist_bit_equality(spark, docs, budget):
    a = plan_dict(
        mixture_plan(docs, "lang", "doc_id", W, budget, mode="window")
    )
    b = plan_dict(mixture_plan(docs, "lang", "doc_id", W, budget, mode="hist"))
    assert a == b


def test_missing_domain_gets_zero_copies(spark, docs):
    w = {"en": 1}  # every non-en doc must emit n_copies = 0, still present
    out = plan_dict(mixture_plan(docs, "lang", "doc_id", w, 10_000, mode="hist"))
    assert len(out) == docs.count()
    assert all(v[2] == 0 for k, v in out.items() if v[0] != "en")


def test_budget_accounting(spark, docs):
    budget = 60_000
    plan = mixture_plan(docs, "lang", "doc_id", W, budget, mode="window")
    ach = {
        r["lang"]: (r["ach"], r["t"])
        for r in plan.groupBy("lang")
        .agg(
            F.sum(F.col("toks") * F.col("n_copies")).alias("ach"),
            F.sum("toks").alias("t"),
        )
        .collect()
    }
    budgets = _domain_budgets(W, budget)
    for d, (got, total) in ach.items():
        nd = budgets[d]
        # never over budget; under by at most one partial-epoch doc,
        # i.e. the greedy prefix is maximal: gap < max doc size in the
        # domain (conservatively: gap < total)
        assert got <= nd
        assert nd - got < total
        # full-epoch floor always achieved
        assert got >= (nd // total) * total


def test_partition_order_invariance(spark, docs):
    base = plan_dict(mixture_plan(docs, "lang", "doc_id", W, 55_555, mode="hist"))
    shuffled = docs.repartition(13)
    again = plan_dict(
        mixture_plan(shuffled, "lang", "doc_id", W, 55_555, mode="hist")
    )
    assert base == again


def test_salt_changes_partial_epoch_only(spark, docs):
    a = plan_dict(mixture_plan(docs, "lang", "doc_id", W, 60_000, salt="s1"))
    b = plan_dict(mixture_plan(docs, "lang", "doc_id", W, 60_000, salt="s2"))
    # both salts satisfy the same per-domain budget bound (achieved ≤ nd;
    # exact achieved totals differ because a different greedy prefix
    # carries the partial epoch — that difference is the point of salt)
    budgets = _domain_budgets(W, 60_000)

    def tot(p):
        agg: dict = {}
        for _, (d, t, n) in p.items():
            agg[d] = agg.get(d, 0) + t * n
        return agg

    for p in (a, b):
        for d, got in tot(p).items():
            assert got <= budgets[d]
    assert a != b  # different docs carry the partial epoch


def test_validation():
    with pytest.raises(ValueError, match="negative"):
        _domain_budgets({"a": -1}, 10)
    with pytest.raises(ValueError, match="sum to 0"):
        _domain_budgets({"a": 0}, 10)
    with pytest.raises(ValueError, match="budget_tokens"):
        _domain_budgets({"a": 1}, -5)


def test_bad_mode(spark, docs):
    with pytest.raises(ValueError, match="mode"):
        mixture_plan(docs, "lang", "doc_id", W, 10, mode="nope")


def test_zero_token_domain_via_tok_col(spark):
    """A domain whose every doc has 0 tokens (reachable only through a
    caller tok_col — the tokenizer path floors at 1) must yield
    n_copies = 0 everywhere, never NULL (`_nd div _t` guard), in BOTH
    modes."""
    rows = [(i, "empty", 0) for i in range(5)] + [
        (10 + i, "en", 100) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, toks long")
    for mode in ("window", "hist"):
        out = mixture_plan(
            df, "lang", "doc_id", {"empty": 1, "en": 1}, 400,
            text_col=None, tok_col="toks", mode=mode,
        ).collect()
        got = {r["doc_id"]: r["n_copies"] for r in out}
        assert all(v is not None for v in got.values()), mode
        assert all(got[i] == 0 for i in range(5)), mode  # zero-token domain
        assert sum(got[10 + i] * 100 for i in range(5)) <= 200, mode


def test_null_toks_count_as_zero(spark):
    """NULL token counts coalesce to 0: the plan stays fully defined and
    window/hist stay bit-equal."""
    rows = [(0, "en", None), (1, "en", 60), (2, "en", 40), (3, "en", 50)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, toks long")
    a = plan_dict(
        mixture_plan(df, "lang", "doc_id", {"en": 1}, 100,
                     text_col=None, tok_col="toks", mode="window")
    )
    b = plan_dict(
        mixture_plan(df, "lang", "doc_id", {"en": 1}, 100,
                     text_col=None, tok_col="toks", mode="hist")
    )
    assert a == b
    assert all(n is not None for _, (_, _, n) in a.items())
    assert a[0][1] == 0  # null toks emitted as 0
