"""Exact-substring (repeated-span) dedup (operators/spans.py) — Lee et
al. 2022 semantics at fixed span length, with a DuckDB differential for
the detection stage."""

import duckdb
import pytest
from pyspark.sql import functions as F

from time_series_loader_spark.operators.spans import (
    remove_repeated_spans,
    repeated_spans,
)

BOILER = "all rights reserved contact the publisher for permission details here"  # 10 tokens


def _corpus():
    u = lambda i, k: " ".join(f"u{i}w{j}" for j in range(k))
    return [
        (0, u(0, 6) + " " + BOILER + " " + u(10, 5)),   # boiler at 6
        (1, BOILER + " " + u(1, 12)),                   # boiler at 0
        (2, u(2, 20)),                                  # clean
        (3, u(3, 4) + " " + BOILER),                    # boiler at tail
        (4, "short text only"),                         # < n tokens
    ]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(_corpus(), "doc_id LONG, text STRING")


def test_repeated_spans_finds_the_boilerplate(spark, corpus):
    out = repeated_spans(corpus, "text", "doc_id", n=10, min_docs=2)
    rows = out.collect()
    assert all(r["n_docs"] == 3 for r in rows)
    starts = {(r["doc_id"], r["start"], r["end"]) for r in rows}
    assert starts == {(0, 6, 16), (1, 0, 10), (3, 4, 14)}


def test_repeated_spans_duckdb_differential(spark, corpus):
    """Detection stage replicated in SQL over the same corpus."""
    got = {
        (r["doc_id"], r["start"], r["n_docs"])
        for r in repeated_spans(corpus, "text", "doc_id", n=10, min_docs=2).collect()
    }
    con = duckdb.connect()
    import pandas as pd

    con.register("documents", pd.DataFrame(_corpus(), columns=["doc_id", "text"]))
    duck = con.execute(
        r"""
        WITH tk AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
                    FROM documents),
        sp AS (
          SELECT doc_id, CAST(i - 1 AS INT) AS start,
                 md5(array_to_string(t[CAST(i AS BIGINT):CAST(i + 9 AS BIGINT)], ' ')) AS digest
          FROM tk, LATERAL (SELECT UNNEST(range(1, greatest(len(t) - 8, 1))) AS i)
        ),
        dup AS (SELECT digest, count(DISTINCT doc_id) AS n_docs FROM sp
                GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2)
        SELECT sp.doc_id, sp.start, dup.n_docs FROM sp JOIN dup USING (digest)
        """
    ).fetchall()
    assert got == set(duck)


def test_remove_repeated_spans_keep_first(spark, corpus):
    out = {
        r["doc_id"]: r["text"]
        for r in remove_repeated_spans(corpus, "text", "doc_id", n=10, min_docs=2).collect()
    }
    assert len(out) == 5
    # doc 0 (min id) KEEPS the boilerplate; 1 and 3 lose exactly it
    assert BOILER in out[0]
    assert BOILER not in out[1] and BOILER not in out[3]
    assert out[1] == " ".join(f"u1w{j}" for j in range(12))
    assert out[3] == " ".join(f"u3w{j}" for j in range(4))
    # untouched docs survive verbatim (whitespace-normalized)
    assert out[2] == _corpus()[2][1]
    assert out[4] == "short text only"


def test_remove_repeated_spans_strip_all_and_empty_doc(spark):
    rows = [(0, BOILER), (1, BOILER)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {
        r["doc_id"]: r["text"]
        for r in remove_repeated_spans(
            df, "text", "doc_id", n=10, min_docs=2, keep_first=False
        ).collect()
    }
    # keep_first=False strips EVERY occurrence; fully-stripped docs come
    # back as empty strings, not missing rows
    assert out == {0: "", 1: ""}


def test_long_repeat_tiled_by_windows(spark):
    """A shared repeat LONGER than n is fully removed: tiling length-n
    windows cover all of it."""
    long_rep = " ".join(f"rep{j}" for j in range(15))
    rows = [(0, "alpha " + long_rep), (1, long_rep + " omega")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {
        r["doc_id"]: r["text"]
        for r in remove_repeated_spans(df, "text", "doc_id", n=10, min_docs=2).collect()
    }
    assert out[0] == "alpha " + long_rep  # first doc keeps it
    assert out[1] == "omega"              # all 15 repeat tokens gone


def test_untouched_docs_keep_exact_bytes_incl_case(spark):
    """Docs with nothing flagged must pass through BYTE-identical —
    casing, punctuation, irregular spacing preserved (review finding:
    the first cut rebuilt everyone from lowercased tokens)."""
    rows = [
        (0, BOILER),
        (1, BOILER + " tail"),
        (2, "Hello  World. See NASA!"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {
        r["doc_id"]: r["text"]
        for r in remove_repeated_spans(df, "text", "doc_id", n=10, min_docs=2).collect()
    }
    assert out[2] == "Hello  World. See NASA!"  # untouched → exact bytes
    assert out[0] == BOILER                      # keeper also untouched here


def test_rewritten_docs_preserve_case_of_survivors(spark):
    rows = [(0, BOILER), (1, BOILER + " Unique TAIL Words")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {
        r["doc_id"]: r["text"]
        for r in remove_repeated_spans(df, "text", "doc_id", n=10, min_docs=2).collect()
    }
    assert out[1] == "Unique TAIL Words"  # original casing survives the rewrite


def test_keep_first_prefix_doc_does_not_hole_the_keeper(spark):
    """Review finding: a lower-id doc sharing only the PREFIX window of a
    longer repeat must not strip that window out of the doc that keeps
    the full occurrence."""
    long_rep = " ".join(f"r{j}" for j in range(20))
    first10 = " ".join(f"r{j}" for j in range(10))
    rows = [
        (0, "x " + first10),          # shares only the first window
        (1, long_rep + " tailone"),   # keeper of the long repeat
        (2, long_rep + " tailtwo"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {
        r["doc_id"]: r["text"]
        for r in remove_repeated_spans(df, "text", "doc_id", n=10, min_docs=2).collect()
    }
    assert out[0] == "x " + first10   # keeper of the prefix window
    # doc 1 keeps its long occurrence minus AT MOST the one genuinely
    # prefix-shared position (position 0, covered by no doc-1-keeper window)
    kept_tokens = out[1].split()
    assert "tailone" in kept_tokens
    assert len([t for t in kept_tokens if t.startswith("r")]) >= 19
    # doc 2 loses the whole repeat
    assert out[2] == "tailtwo"


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# small random corpora over a tiny vocabulary → repeats occur organically
_corpus_strategy = st.lists(
    st.lists(st.sampled_from(list("abcd")), min_size=0, max_size=12),
    min_size=1,
    max_size=6,
)

_SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(_corpus_strategy)
@_SET
def test_spans_property_vs_python_reference(spark, token_lists):
    """repeated_spans == a brute-force python reference on random small
    corpora (n=3), and keep_first=False removal strips exactly the
    flagged positions."""
    from collections import defaultdict

    n = 3
    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")

    # python reference
    by_span = defaultdict(set)
    for i, toks in enumerate(token_lists):
        for s in range(len(toks) - n + 1):
            by_span[tuple(toks[s : s + n])].add(i)
    dup_spans = {k for k, docs in by_span.items() if len(docs) >= 2}
    want_flags = set()
    bad_pos = defaultdict(set)
    for i, toks in enumerate(token_lists):
        for s in range(len(toks) - n + 1):
            t = tuple(toks[s : s + n])
            if t in dup_spans:
                want_flags.add((i, s, len(by_span[t])))
                bad_pos[i].update(range(s, s + n))

    got_flags = {
        (r["doc_id"], r["start"], r["n_docs"])
        for r in repeated_spans(df, "text", "doc_id", n=n, min_docs=2).collect()
    }
    assert got_flags == want_flags

    got_txt = {
        r["doc_id"]: r["text"]
        for r in remove_repeated_spans(
            df, "text", "doc_id", n=n, min_docs=2, keep_first=False
        ).collect()
    }
    for i, toks in enumerate(token_lists):
        want = " ".join(t for p, t in enumerate(toks) if p not in bad_pos[i])
        if not bad_pos[i]:
            want = " ".join(toks)  # untouched docs: original text verbatim
        assert got_txt[i] == want, (i, toks)


# ---------------------------------------------------------------------------
# winnowed (minimizer-sampled) variant — the 100 TB scale path


def _wcorpus():
    """Two docs sharing a LONG repeat (>= w+n-1 tokens), one clean."""
    shared = " ".join(f"boiler{j}" for j in range(30))  # 30-token repeat
    u = lambda i, k: " ".join(f"u{i}w{j}" for j in range(k))
    return [
        (0, u(0, 7) + " " + shared + " " + u(10, 5)),
        (1, shared + " " + u(1, 9)),
        (2, u(2, 40)),
    ]


def test_winnowed_guarantee_long_repeat_detected(spark):
    """Schleimer et al. guarantee: a repeat of length >= w+n-1 is always
    flagged in EVERY document containing it (here 30 >= 16+5-1=20)."""
    from time_series_loader_spark.operators.spans import repeated_spans_winnowed

    df = spark.createDataFrame(_wcorpus(), "doc_id LONG, text STRING")
    out = repeated_spans_winnowed(df, "text", "doc_id", n=5, w=16, min_docs=2)
    rows = out.collect()
    flagged_docs = {r["doc_id"] for r in rows}
    assert flagged_docs == {0, 1}
    assert all(r["n_docs"] == 2 for r in rows)
    # every flagged anchor must lie inside the shared repeat region
    for r in rows:
        if r["doc_id"] == 0:
            assert 7 <= r["start"] and r["end"] <= 7 + 30
        else:
            assert 0 <= r["start"] and r["end"] <= 30
    # the same anchor (relative offset + digest) fires in both docs —
    # that is what makes cross-doc grouping work at scale
    d0 = {(r["start"] - 7, r["digest"]) for r in rows if r["doc_id"] == 0}
    d1 = {(r["start"], r["digest"]) for r in rows if r["doc_id"] == 1}
    assert d0 == d1 and d0


def test_winnowed_subset_of_exact(spark, corpus):
    """Everything winnowing flags must also be flagged by the exact
    operator (same n), with the identical digest+doc set — winnowing
    SAMPLES the exact relation, never invents rows."""
    from time_series_loader_spark.operators.spans import repeated_spans_winnowed

    exact = {
        (r["doc_id"], r["start"], r["digest"]): r["n_docs"]
        for r in repeated_spans(corpus, "text", "doc_id", n=10, min_docs=2).collect()
    }
    win = {
        (r["doc_id"], r["start"], r["digest"]): r["n_docs"]
        for r in repeated_spans_winnowed(
            corpus, "text", "doc_id", n=10, w=4, min_docs=2
        ).collect()
    }
    assert set(win) <= set(exact)
    # winnowed n_docs counts SAMPLING docs — a lower bound on the exact
    # occurrence count (see operator docstring)
    for k, nd in win.items():
        assert 2 <= nd <= exact[k], (k, nd, exact[k])
    # the 10-token boilerplate here is a repeat of length 10 < w+n-1=13,
    # so detection is NOT guaranteed at w=4 — but with w<=m windows over
    # identical hash runs it still fires; assert we kept the cross-doc grouping
    assert {d for d, _, _ in win} <= {0, 1, 3}


def test_winnowed_density(spark):
    """Selected-fingerprint density ~ 2/(w+1): far below 1 per token."""
    from time_series_loader_spark.operators.spans import repeated_spans_winnowed
    from time_series_loader_spark.operators.text import tokens

    import random

    rng = random.Random(7)
    rows = [
        (i, " ".join(f"t{rng.randrange(10_000)}" for _ in range(400)))
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    # count selected anchors via a min_docs=1 run (every doc counted)
    out = repeated_spans_winnowed(df, "text", "doc_id", n=5, w=15, min_docs=1)
    n_sel = out.count()
    n_tokens = 20 * 400
    density = n_sel / n_tokens
    assert density < 3.0 / (15 + 1), density   # ~2/(w+1)=0.125 expected
    assert density > 0.5 / (15 + 1), density   # sanity: not degenerate


def test_winnowed_partitioning_invariant(spark):
    from time_series_loader_spark.operators.spans import repeated_spans_winnowed

    df = spark.createDataFrame(_wcorpus(), "doc_id LONG, text STRING")
    a = sorted(
        map(tuple, repeated_spans_winnowed(df, "text", "doc_id", n=5, w=8).collect())
    )
    b = sorted(
        map(
            tuple,
            repeated_spans_winnowed(
                df.repartition(7), "text", "doc_id", n=5, w=8
            ).collect(),
        )
    )
    assert a == b


def test_winnowed_short_and_empty_docs(spark):
    from time_series_loader_spark.operators.spans import repeated_spans_winnowed

    df = spark.createDataFrame(
        [(0, "a b c"), (1, ""), (2, "a b c")], "doc_id LONG, text STRING"
    )
    # docs shorter than n produce nothing; n=5 > 3 tokens
    assert repeated_spans_winnowed(df, "text", "doc_id", n=5, w=4).count() == 0
    # n=2, w=2: the 3-token twins share everything
    out = repeated_spans_winnowed(df, "text", "doc_id", n=2, w=2, min_docs=2)
    assert {r["doc_id"] for r in out.collect()} == {0, 2}


def test_winnowed_guarantee_property(spark):
    """Hypothesis: plant a random shared repeat of length >= w+n-1 into
    two random documents at random offsets — the winnowing guarantee
    says BOTH docs must be flagged, with at least one shared anchor
    digest between them, for every draw."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from time_series_loader_spark.operators.spans import repeated_spans_winnowed

    n, w = 4, 6
    guarantee = w + n - 1  # 9 tokens

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[
            HealthCheck.too_slow,
            HealthCheck.function_scoped_fixture,
        ],
    )
    @given(
        rep_len=st.integers(guarantee, guarantee + 6),
        pre_a=st.integers(0, 8),
        post_a=st.integers(0, 8),
        pre_b=st.integers(0, 8),
        post_b=st.integers(0, 8),
        seed=st.integers(0, 2**31 - 1),
    )
    def run(rep_len, pre_a, post_a, pre_b, post_b, seed):
        import random

        rng = random.Random(seed)
        # disjoint vocabularies: the repeat can't accidentally extend
        rep = " ".join(f"r{seed % 997}x{j}" for j in range(rep_len))
        fill = lambda tag, k: " ".join(
            f"{tag}{rng.randrange(10**6)}" for _ in range(k)
        )
        doc_a = " ".join(x for x in (fill("a", pre_a), rep, fill("a", post_a)) if x)
        doc_b = " ".join(x for x in (fill("b", pre_b), rep, fill("b", post_b)) if x)
        df = spark.createDataFrame(
            [(0, doc_a), (1, doc_b)], "doc_id LONG, text STRING"
        )
        out = repeated_spans_winnowed(df, "text", "doc_id", n=n, w=w, min_docs=2)
        rows = out.collect()
        by_doc = {0: set(), 1: set()}
        for r in rows:
            assert r["n_docs"] == 2
            by_doc[r["doc_id"]].add(r["digest"])
            # every flag must lie inside the planted repeat
            off = pre_a if r["doc_id"] == 0 else pre_b
            assert off <= r["start"] and r["end"] <= off + rep_len, r
        assert by_doc[0] and by_doc[1]
        assert by_doc[0] & by_doc[1]

    run()


def test_winnowed_plan_shape(spark):
    """Plan guard: the candidate and verify joins must broadcast (the
    token-array side never crosses an exchange as claimed in the
    docstring) — a SortMergeJoin appearing here means the corpus-sized
    frame with the _t arrays started shuffling."""
    from time_series_loader_spark.operators.spans import repeated_spans_winnowed

    rows = [(i, " ".join(f"t{i}_{j}" for j in range(60))) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = repeated_spans_winnowed(df, "text", "doc_id", n=5, w=8)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # the candidate join (the one whose probe side carries _t) broadcasts
    assert "BroadcastHashJoin" in plan
    # no Exchange may carry the token array: every shuffle in this plan
    # moves 8-byte hashes or candidate-sized span strings, never the
    # corpus-sized _t. Formatted mode lists each node's Output schema —
    # check the Exchange nodes' detail blocks.
    import re

    blocks = [
        b
        for b in re.split(r"\n\n", plan)
        if re.match(r"\(\d+\) Exchange", b.strip())
    ]
    assert blocks, "no Exchange blocks found — formatted-plan layout changed"
    for block in blocks:
        in_line = next(
            (l for l in block.splitlines() if l.startswith("Input")), None
        )
        assert in_line is not None, block
        assert "_t#" not in in_line, block


def test_winnowed_skew_one_giant_doc(spark):
    """Skew guard (SCALING.md max-tokens-per-doc note): one 20k-token
    document among small ones — the per-doc O(m·w) selection must
    complete promptly and the giant doc's shared boilerplate with a
    small doc must still be detected."""
    import time

    from time_series_loader_spark.operators.spans import repeated_spans_winnowed

    shared = " ".join(f"b{j}" for j in range(40))
    giant = " ".join(f"g{j}" for j in range(10_000)) + " " + shared + " " + " ".join(
        f"h{j}" for j in range(10_000)
    )
    rows = [(0, giant), (1, shared + " tail here")] + [
        (i, f"tiny doc {i}") for i in range(2, 10)
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    t0 = time.time()
    out = repeated_spans_winnowed(df, "text", "doc_id", n=10, w=12, min_docs=2)
    flagged = out.collect()
    wall = time.time() - t0
    docs_hit = {r["doc_id"] for r in flagged}
    assert docs_hit == {0, 1}
    # the giant doc's anchors sit inside the planted boilerplate region
    for r in flagged:
        if r["doc_id"] == 0:
            assert 10_000 <= r["start"] and r["end"] <= 10_000 + 40
    assert wall < 60, f"skewed doc took {wall:.1f}s"


def test_winnowed_md5_variant_detects_same_guaranteed_repeats(spark):
    """minimizer_hash='md5' (the oracle-replicable variant) selects
    different anchors than xxhash64 but must detect the same guaranteed
    repeats (length ≥ w+n−1) — the guarantee is hash-agnostic."""
    from time_series_loader_spark.operators.spans import repeated_spans_winnowed

    rep = " ".join(f"tok{i}" for i in range(30))  # 30-token repeat
    rows = [
        (1, f"alpha beta {rep} gamma"),
        (2, f"{rep} delta epsilon zeta"),
        (3, "unrelated words only here nothing shared"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    for h in ("xxhash64", "md5"):
        out = repeated_spans_winnowed(
            df, "text", "doc_id", n=5, w=8, min_docs=2, minimizer_hash=h
        ).collect()
        docs = {r["doc_id"] for r in out}
        assert docs == {1, 2}, h
        assert all(r["n_docs"] == 2 for r in out), h


def test_winnowed_md5_rejects_unknown_hash(spark):
    from time_series_loader_spark.operators.spans import repeated_spans_winnowed

    df = spark.createDataFrame([(1, "a b c")], "doc_id BIGINT, text STRING")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        repeated_spans_winnowed(df, "text", "doc_id", minimizer_hash="sha9")
