"""Text-analysis + dedup operators on small synthetic corpora."""

import pytest
from pyspark.sql import functions as F

from time_series_loader_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
    word_shingles,
)
from time_series_loader_spark.operators.text import (
    fingerprint,
    language_id,
    quality_features,
    simhash16,
    token_stats,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
    (3, "completely different text about spark engines"),
    (4, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
    (5, "der hund ist nicht mit der katze und der maus"),  # German markers
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id BIGINT, text STRING")


def test_token_stats(spark, docs):
    out = {r["doc_id"]: r for r in token_stats(docs, "text", "doc_id").collect()}
    assert out[1]["n_tokens"] == 9
    assert out[1]["n_chars"] == len(DOCS[0][1])
    # mean token length: chars-without-spaces / tokens
    assert out[1]["mean_token_len"] == pytest.approx((len(DOCS[0][1]) - 8) / 9)


def test_quality_and_langid(spark, docs):
    q = {r["doc_id"]: r for r in quality_features(docs, "text", "doc_id").collect()}
    assert 0.0 <= q[1]["quality_score"] <= 1.0
    assert q[1]["stopword_ratio"] == pytest.approx(2 / 9)  # 'the' twice
    lang = {r["doc_id"]: r["lang_pred"] for r in language_id(docs, "text", "doc_id").collect()}
    assert lang[1] == "en"
    assert lang[5] == "de"


def test_fingerprint_normalizes_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "a  b\tc"), (2, "A B C"), (3, "a b d")], "doc_id BIGINT, text STRING"
    )
    out = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df, "text", "doc_id").collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_dedup_exact(spark, docs):
    out = dedup_exact(docs, ["text"], "doc_id").collect()
    assert len(out) == 4  # docs 1 and 4 collapse
    by_id = {r["doc_id"]: r["n_dups"] for r in out}
    assert by_id[1] == 2  # representative is min(doc_id)
    assert 4 not in by_id


def test_word_shingles_short_doc(spark):
    df = spark.createDataFrame([(1, "one two")], "doc_id BIGINT, text STRING")
    out = df.select(word_shingles("text", 3).alias("sh")).collect()[0]["sh"]
    assert out == []


def test_ngram_jaccard_finds_near_dup(spark, docs):
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5).collect()
    found = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert found[(1, 4)] == 1.0  # exact dup
    assert (1, 2) in found and 0.5 <= found[(1, 2)] < 1.0
    assert all({a, b} != {1, 3} for a, b in found)


def test_ngram_jaccard_max_df_bounds_candidates(spark):
    """One universal shingle must not detonate the inverted-index join:
    with max_df below the corpus size, the hot shingle is dropped from
    candidate generation, yet reported pairs keep their EXACT jaccard
    (verify pass runs on full shingle sets)."""
    # every doc starts with the same 5 words (shingles 'c0 c1 c2'..'c2 c3 c4'
    # are universal); each doc then diverges, except 0/1 which are near-dups
    common = "c0 c1 c2 c3 c4"
    rows = [(0, common + " x0 x1 x2 x3"), (1, common + " x0 x1 x2 x9")]
    rows += [(i, f"{common} u{i}a u{i}b u{i}c u{i}d") for i in range(2, 40)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")

    exact = ngram_jaccard_pairs(df, "text", "doc_id", n=3, threshold=0.5, max_df=None)
    capped = ngram_jaccard_pairs(df, "text", "doc_id", n=3, threshold=0.5, max_df=10)
    key = lambda r: (r["id_a"], r["id_b"], r["n_common"], round(r["jaccard"], 9))
    exact_rows = sorted(map(key, exact.collect()))
    capped_rows = sorted(map(key, capped.collect()))
    # same qualifying pairs with identical exact jaccard: at threshold 0.5
    # no pair can qualify on universal shingles alone here
    assert capped_rows == exact_rows and len(capped_rows) >= 1

    # candidate generation is bounded: the capped inverted index carries no
    # shingle with df > 10, so the self-join's biggest key fans out ≤ 10²
    # instead of 40² — assert the index really dropped the universal ones
    from time_series_loader_spark.operators.dedup import shingle_table

    sh = shingle_table(df, "text", "doc_id", 3)
    dfreq = sh.groupBy("shingle").count()
    assert dfreq.where(F.col("count") > 10).count() >= 3  # universal shingles exist


def test_ngram_jaccard_max_df_auto_is_corpus_relative(spark):
    """Default 'auto' cutoff = max(1000, 0.1%·N): a flat absolute default
    either never engages (small corpora) or lets boilerplate shingles fan
    the self-join out quadratically (huge corpora)."""
    from time_series_loader_spark.operators.dedup import resolve_max_df

    small = spark.range(500).selectExpr("id AS doc_id", "'t' AS text")
    assert resolve_max_df("auto", small) == 1000  # floor engages below 1M docs
    assert resolve_max_df(None, small) is None  # explicit: unbounded
    assert resolve_max_df(77, small) == 77  # explicit: verbatim
    big = spark.range(5_000_000).selectExpr("id AS doc_id", "'t' AS text")
    assert resolve_max_df("auto", big) == 5000  # 0.1% of N above the floor

    # precomputed n_docs short-circuits the count() — derived-frame callers
    # (post-scrub pipelines) shouldn't pay a full plan execution for the
    # cutoff. Prove no job runs: hand in a frame that would THROW if counted.
    poisoned = spark.range(10).where(
        F.length(F.raise_error(F.lit("must not execute"))) >= 0
    )
    with pytest.raises(Exception, match="must not execute"):
        poisoned.count()  # the poison is real: counting it executes raise_error
    assert resolve_max_df("auto", poisoned, n_docs=2_000_000) == 2000
    assert resolve_max_df("auto", poisoned, n_docs=100) == 1000  # floor still applies

    # the default end-to-end path resolves without error and stays exact
    common = "c0 c1 c2 c3 c4"
    rows = [(0, common + " x0 x1 x2 x3"), (1, common + " x0 x1 x2 x9")]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = ngram_jaccard_pairs(df, "text", "doc_id", n=3, threshold=0.5).collect()
    assert len(got) == 1 and got[0]["id_a"] == 0 and got[0]["id_b"] == 1


def test_ngram_jaccard_prefix_variant_identical(spark, docs):
    from time_series_loader_spark.operators.dedup import ngram_jaccard_pairs_prefix

    base = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.3).collect()
    pref = ngram_jaccard_pairs_prefix(docs, "text", "doc_id", n=3, threshold=0.3).collect()
    key = lambda r: (r["id_a"], r["id_b"], r["n_common"], round(r["jaccard"], 9))
    assert sorted(map(key, base)) == sorted(map(key, pref))


def test_minhash_lsh_agrees_with_exact_on_dups(spark, docs):
    pairs = minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5).collect()
    found = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs}
    assert found[(1, 4)] == 1.0
    assert (1, 2) in found  # near-dup caught by banding


def test_simhash_properties(spark, docs):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash16(docs, "text", "doc_id").collect()}
    assert all(len(s) == 16 and set(s) <= {"0", "1"} for s in sigs.values())
    assert sigs[1] == sigs[4]  # identical docs → identical simhash
    pairs = simhash_near_dup_pairs(docs, "text", "doc_id", max_hamming=3).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 4) in ids


def test_simhash_blocking_is_exact_for_small_hamming(spark, docs):
    """Block-key joining must find exactly the pairs a brute-force scan
    finds (pigeonhole: k mismatches leave ≥1 of k+1 blocks identical)."""
    from time_series_loader_spark.operators.text import hamming_bits, simhash_bits

    sig = simhash_bits(docs, "text", "doc_id", n_bits=32)
    a = sig.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a"))
    b = sig.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b"))
    brute = (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming_bits(F.col("sh_a"), F.col("sh_b"), 32).alias("h"))
        .where(F.col("h") <= 3)
        .collect()
    )
    blocked = simhash_near_dup_pairs(
        docs, "text", "doc_id", max_hamming=3, n_bits=32
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in brute} == {
        (r["id_a"], r["id_b"]) for r in blocked
    }


def test_near_dup_pairs_returns_exact_scores_on_lsh_candidates(spark, docs):
    """The packaged LSH-prefilter → exact-verify composition (r11):
    every reported pair must carry the TRUE n-gram Jaccard — equal to
    what the exact all-candidates algorithm computes for that pair —
    and must be an LSH band candidate."""
    from time_series_loader_spark.operators.dedup import near_dup_pairs

    ver = near_dup_pairs(docs, "text", "doc_id", n=3, threshold=0.3).collect()
    exact = {
        (r["id_a"], r["id_b"]): (r["n_common"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", n=3, threshold=0.0, max_df=None
        ).collect()
    }
    cand = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            docs, "text", "doc_id", threshold=0.0
        ).collect()
    }
    assert ver, "expected near-dups in the fixture corpus"
    for r in ver:
        key = (r["id_a"], r["id_b"])
        assert key in cand, f"{key} reported but not an LSH candidate"
        assert exact[key] == (r["n_common"], round(r["jaccard"], 9))
        assert r["jaccard"] >= 0.3
    # completeness w.r.t. the candidate set: every candidate whose exact
    # score clears the threshold is reported
    expected = {k for k in cand if k in exact and exact[k][1] >= 0.3}
    assert {(r["id_a"], r["id_b"]) for r in ver} == expected
    # the exact-dup pair scores 1.0 exactly
    by_pair = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ver}
    assert by_pair[(1, 4)] == 1.0


def test_near_dup_pairs_verify_false_degrades_to_lsh(spark, docs):
    from time_series_loader_spark.operators.dedup import near_dup_pairs

    key = lambda r: (r["id_a"], r["id_b"], r["est_jaccard"])
    got = sorted(
        map(key, near_dup_pairs(docs, "text", "doc_id", verify=False).collect())
    )
    want = sorted(
        map(key, minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5).collect())
    )
    assert got == want


def test_near_dup_pairs_candidate_passthrough(spark, docs):
    """Passing a precomputed (materialized) candidate frame must give
    the identical result as letting the operator build its own."""
    from time_series_loader_spark.operators.dedup import near_dup_pairs

    cand = minhash_lsh_pairs(
        docs, "text", "doc_id", threshold=0.0
    ).localCheckpoint(eager=True)
    key = lambda r: (
        r["id_a"], r["id_b"], r["est_jaccard"], r["n_common"],
        round(r["jaccard"], 9),
    )
    own = sorted(map(key, near_dup_pairs(docs, "text", "doc_id").collect()))
    given = sorted(
        map(key, near_dup_pairs(docs, "text", "doc_id", candidates=cand).collect())
    )
    assert own == given


def test_near_dup_pairs_candidate_threshold_prunes_verification(spark, docs):
    """candidate_threshold trades recall for fewer verifications: with
    the bar at 1.0 only exact-signature collisions survive to verify."""
    from time_series_loader_spark.operators.dedup import near_dup_pairs

    strict = near_dup_pairs(
        docs, "text", "doc_id", threshold=0.3, candidate_threshold=1.0
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in strict} == {(1, 4)}


def test_near_dup_pairs_keep_representatives_composition(spark, docs):
    """End-to-end verified dedup: near_dup_pairs → keep_representatives
    keeps exactly one doc per exact-Jaccard cluster (min id) and leaves
    unpaired docs untouched — the 100 TB dedup ACTION on verified
    scores."""
    from time_series_loader_spark.operators.dedup import near_dup_pairs
    from time_series_loader_spark.operators.graph import keep_representatives

    pairs = near_dup_pairs(docs, "text", "doc_id", n=3, threshold=0.3)
    kept = {r["doc_id"] for r in keep_representatives(docs, pairs, "doc_id").collect()}
    # fixture: {1,2,4} cluster (1 exact-dups 4, 1 near-dups 2 at J>=0.3)
    # → keep 1; docs 3 and 5 are in no pair → kept
    assert kept == {1, 3, 5}


def test_lsh_s_curve_helpers_match_empirical_recall(spark, docs):
    """The S-curve helpers quantify the recall contract: probability of
    band collision must match a brute-force enumeration over the
    banding combinatorics, and the default gate config's midpoint sits
    above the 0.5 dedup threshold (borderline pairs are the documented
    trade, near-exact pairs near-certain)."""
    from math import isclose

    from time_series_loader_spark.operators.dedup import (
        lsh_collision_probability,
        lsh_threshold_midpoint,
    )

    # closed form vs direct expansion at a few points
    for j in (0.1, 0.5, 0.71, 0.9, 0.99):
        b, r = 4, 4
        direct = 1 - (1 - j**r) ** b
        assert isclose(lsh_collision_probability(j, 16, 4), direct)
    mid = lsh_threshold_midpoint(16, 4)
    assert isclose(mid, 0.25 ** 0.25)
    assert isclose(lsh_collision_probability(mid, 16, 4), 1 - (1 - 0.25) ** 4)
    # monotone and steep: recall at 0.99 similarity must be near-certain
    assert lsh_collision_probability(0.99, 16, 4) > 0.995
    assert lsh_collision_probability(0.3, 16, 4) < 0.05
    import pytest as _pytest

    with _pytest.raises(ValueError):
        lsh_collision_probability(0.5, 16, 5)

    # the docstring's quoted figures must agree with the formula they
    # describe (ADVICE r11: the original quotes contradicted it)
    doc = lsh_threshold_midpoint.__doc__
    assert "0.78" in doc and isclose(
        lsh_collision_probability(0.75, 16, 4), 0.78, abs_tol=0.005
    )
    assert "0.986" in doc and isclose(
        lsh_collision_probability(0.9, 16, 4), 0.986, abs_tol=0.001
    )
    # midpoint collision probability is 1-(1-1/b)^b ≈ 0.68 (NOT 0.5)
    assert "0.68" in doc and isclose(
        lsh_collision_probability(mid, 16, 4), 0.6836, abs_tol=0.001
    )
