"""End-to-end CorpusPipeline (plans/corpus.py): the full curation chain
on a crafted corpus where every stage has something to do."""

import pathlib

import pytest
from pyspark.sql import functions as F

from time_series_loader_spark.plans.corpus import CorpusPipeline

GOOD = (
    "the quick brown fox jumps over that lazy dog and keeps running with "
    "steady pace through the forest to find some food and water for the "
    "long winter that is coming soon and everyone must have enough stored "
    "away before the first snow falls on the quiet valley floor tonight "
    "while the wind blows gently across the open meadow near the river"
)

BENCH = "the first snow falls on the quiet valley floor tonight while the wind"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # 0-9: good unique docs (vary a suffix word so they're not dups)
        *[(i, GOOD + f" marker{i} variant of the story number {i} told here") for i in range(10)],
        # 10: exact duplicate of 0
        (10, GOOD + " marker0 variant of the story number 0 told here"),
        # 11: PII-bearing good doc
        (11, GOOD + " contact someone at alice@example.com for more details today"),
        # 12: low-quality short doc
        (12, "short junk"),
        # 13: contaminated with the benchmark 8-grams (GOOD contains BENCH)
        # — all of 0-11 contain it too; doc 13 is junk + bench to show the
        # filter alone drops it even when quality passes... keep simple:
        # benchmark decontam is tested with max_hits high enough to keep
        # GOOD docs out of scope; see test_decontaminate_drops_hits
        (13, "numbers 1 2 3 4 5 6 7 8 9 10 11 12"),
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_filters_fuse_into_one_scan(spark, corpus):
    """scrub + quality + language are projections/filters — the combined
    plan must still contain exactly one source scan and no exchange."""
    p = (
        CorpusPipeline(corpus, "doc_id", "text")
        .scrub_pii()
        .quality_filter(min_score=0.2, gopher=True)
        .keep_languages(["en"])
    )
    plan = p.df()._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") == 1
    assert "Exchange" not in plan


def test_full_chain_end_to_end(spark, corpus, tmp_path):
    p = (
        CorpusPipeline(corpus, "doc_id", "text")
        .scrub_pii()
        .quality_filter(min_score=0.2, gopher=True)
        .keep_languages(["en"])
        .dedup_exact()
        .dedup_near(threshold=0.8)
    )
    out = p.df()
    ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    # 12 (quality), 13 (gopher: no stopwords/numeric) dropped; 10 (exact
    # dup of 0, higher id) dropped; near-dup pass keeps one rep per
    # cluster — docs 0-9 differ by a few tokens out of ~70, Jaccard >0.8
    # → one representative survives; 11 differs more (PII tail) but may
    # join the cluster; assert the invariants rather than one exact set:
    assert 0 in ids  # min-id representative always survives
    assert 10 not in ids and 12 not in ids and 13 not in ids
    assert len(ids) <= 3

    # PII scrubbed before anything downstream sees text
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert all("alice@example.com" not in t for t in texts.values())

    # manifest of applied steps, in order
    assert p.steps_applied == [
        "scrub_pii",
        "quality_score>=0.2",
        "gopher_rules",
        "lang in ['en']",
        "dedup_exact",
        "dedup_near(exact_j>=0.8)",
    ]

    # pack and write: shards land, manifest is consistent
    man = p.pack_and_write(str(tmp_path / "shards"), budget=100)
    rows = man.collect()
    assert sum(r["n_rows"] for r in rows) == len(ids)
    assert all(r["n_files"] == 1 for r in rows)
    files = list(pathlib.Path(tmp_path / "shards").rglob("*.parquet"))
    assert len(files) == len(rows)


def test_dedup_near_verified_is_the_default_and_matches_operator(spark, corpus):
    """VERDICT r11 directive #2: the builder's dedup_near must exercise
    the VERIFIED path (near_dup_pairs, exact-Jaccard threshold) by
    default, not the minhash ESTIMATE — and its keep-set must equal the
    operator composition it documents."""
    from time_series_loader_spark.operators.dedup import (
        minhash_lsh_pairs,
        near_dup_pairs,
    )
    from time_series_loader_spark.operators.graph import keep_representatives

    kept_default = sorted(
        r["doc_id"]
        for r in CorpusPipeline(corpus, "doc_id", "text")
        .dedup_near(threshold=0.8)
        .df()
        .select("doc_id")
        .collect()
    )
    pairs = near_dup_pairs(corpus, "text", "doc_id", threshold=0.8)
    kept_op = sorted(
        r["doc_id"]
        for r in keep_representatives(corpus, pairs, "doc_id")
        .select("doc_id")
        .collect()
    )
    assert kept_default == kept_op

    # verify=False degrades to the estimate-thresholded form, tagged so
    p = CorpusPipeline(corpus, "doc_id", "text").dedup_near(
        threshold=0.8, verify=False
    )
    kept_est = sorted(r["doc_id"] for r in p.df().select("doc_id").collect())
    est_pairs = minhash_lsh_pairs(corpus, "text", "doc_id", threshold=0.8)
    kept_est_op = sorted(
        r["doc_id"]
        for r in keep_representatives(corpus, est_pairs, "doc_id")
        .select("doc_id")
        .collect()
    )
    assert kept_est == kept_est_op
    assert p.steps_applied == ["dedup_near(est_j>=0.8)"]

    # the two forms threshold DIFFERENT scores: on this corpus the
    # 16-hash estimate is ±0.0625-granular, so the keep-sets may differ;
    # both must keep the global min id and all never-paired docs
    assert 0 in kept_default and 0 in kept_est
    for kept in (kept_default, kept_est):
        assert 12 in kept and 13 in kept  # junk docs pair with nothing


def test_decontaminate_drops_hits(spark, corpus):
    out = (
        CorpusPipeline(corpus, "doc_id", "text")
        .decontaminate([BENCH], n=8, max_hits=0)
        .df()
    )
    ids = {r["doc_id"] for r in out.collect()}
    # every GOOD-based doc contains the benchmark 8-grams → dropped;
    # the numeric doc and the short doc share none → kept
    assert ids == {12, 13}


def test_sample_weighted_step(spark, corpus):
    p = CorpusPipeline(corpus, "doc_id", "text").sample_weighted(fraction=0.5)
    out1 = sorted(r["doc_id"] for r in p.df().collect())
    out2 = sorted(
        r["doc_id"]
        for r in CorpusPipeline(corpus.repartition(5), "doc_id", "text")
        .sample_weighted(fraction=0.5)
        .df()
        .collect()
    )
    assert out1 == out2  # deterministic
    # helper weight column does not leak into the output schema
    assert set(p.df().columns) == {"doc_id", "text"}


def test_pipeline_on_real_testdata(spark):
    """Light chain over the driver's documents table: row counts shrink
    monotonically through the stages and a rerun is identical."""
    from time_series_loader_spark.session import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    n0 = docs.count()

    def run():
        p = (
            CorpusPipeline(docs, "doc_id", "text")
            .scrub_pii()
            .quality_filter(min_score=0.2, gopher=False)  # synthetic corpus fails gopher wholesale
            .dedup_exact()
            .sample_weighted(fraction=0.5)
        )
        return sorted(r["doc_id"] for r in p.df().select("doc_id").collect())

    ids = run()
    assert 0 < len(ids) <= n0
    assert ids == run()  # end-to-end deterministic


def test_dedup_spans_step(spark):
    boiler = " ".join(f"b{j}" for j in range(10))
    rows = [
        (0, "keep one " + boiler),
        (1, boiler + " unique tail here"),
        (2, "totally different text"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    p = CorpusPipeline(df, "doc_id", "text").dedup_spans(n=10, min_docs=2)
    out = {r["doc_id"]: r["text"] for r in p.df().collect()}
    assert boiler in out[0]      # first doc keeps the one occurrence
    assert out[1] == "unique tail here"
    assert out[2] == "totally different text"
    assert p.steps_applied == ["dedup_spans(n=10)"]


def test_pipeline_normalize_step(spark):
    """normalize() canonicalizes before dedup: a zero-width-space
    disguise and a combining-accent variant both collapse into their
    plain twins' duplicate groups."""
    from time_series_loader_spark.plans.corpus import CorpusPipeline

    rows = [
        (0, "café menu text here"),   # e + combining accent
        (1, "café menu text here"),    # composed é
        (2, "same​text body"),          # zero-width space
        (3, "sametext body"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = CorpusPipeline(df, "doc_id", "text").normalize().dedup_exact().df()
    survivors = sorted(r["doc_id"] for r in out.collect())
    assert survivors == [0, 2]  # min-id representative of each pair


def test_chunk_step_and_pack_sequences_exclusive(spark, corpus):
    """chunk() re-units the pipeline to windows (text_col -> chunk_text,
    ids non-unique); pack_sequences is the ALTERNATIVE preparation and
    the two refuse to compose. Each works alone on the same pipeline."""
    from time_series_loader_spark.operators.text import tokens
    from pyspark.sql import functions as F

    # chunk path: every doc's windows reassemble its token stream
    p = CorpusPipeline(corpus, "doc_id", "text").chunk(16, overlap_tokens=4)
    assert p.text_col == "chunk_text"
    rows = p.df().collect()
    n_tok = {
        r["doc_id"]: r["n"]
        for r in corpus.select(
            "doc_id", F.size(tokens("text")).alias("n")
        ).collect()
    }
    last_end = {}
    for r in rows:
        last_end[r["doc_id"]] = max(
            last_end.get(r["doc_id"], 0), r["start_tok"] + r["n_chunk_tok"]
        )
    assert last_end == n_tok
    with pytest.raises(ValueError, match="chunk"):
        p.chunk(8)
    with pytest.raises(ValueError, match="pack_sequences after chunk"):
        p.pack_sequences(64)

    # pack path (no chunk): bins except the last are exactly full
    plan = CorpusPipeline(corpus, "doc_id", "text").pack_sequences(64)
    per_bin = {
        r["bin_id"]: r["s"]
        for r in plan.groupBy("bin_id").agg(F.sum("seg_len").alias("s")).collect()
    }
    last = max(per_bin)
    assert all(v == 64 for b, v in per_bin.items() if b != last)


def test_decontaminate_strip_step(spark, corpus):
    """The surgical form keeps every document; contaminated spans are
    gone, clean docs byte-identical, and columns beyond text survive
    the reattach join."""
    p = CorpusPipeline(corpus, "doc_id", "text").decontaminate_strip([BENCH], n=8)
    out = {r["doc_id"]: r["text"] for r in p.df().collect()}
    # nothing dropped (contrast: .decontaminate() drops all GOOD docs)
    assert sorted(out) == list(range(14))
    # the benchmark 8-grams are gone from every doc
    from time_series_loader_spark.operators.decontam import ngram_set

    bench = set(ngram_set([BENCH], 8))
    for t in out.values():
        toks = t.lower().split()
        grams = {" ".join(toks[i : i + 8]) for i in range(max(len(toks) - 7, 0))}
        assert not (grams & bench)
    # the numeric doc shares no 8-gram -> byte-identical
    assert out[13] == "numbers 1 2 3 4 5 6 7 8 9 10 11 12"
    assert p.steps_applied == ["decontam_strip(8-gram,±0)"]


def test_decontaminate_accepts_benchmark_dataframe(spark, corpus):
    """r13: both decontamination steps take a DataFrame of benchmark
    TEXTS (eval suites are tables) and must match the list form row for
    row — the DataFrame path is the broadcast join / anchor-join form."""
    bdf = spark.createDataFrame([(BENCH,)], "text string")
    drop_list = {
        r["doc_id"]
        for r in CorpusPipeline(corpus, "doc_id", "text")
        .decontaminate([BENCH], n=8, max_hits=0).df().collect()
    }
    drop_df = {
        r["doc_id"]
        for r in CorpusPipeline(corpus, "doc_id", "text")
        .decontaminate(bdf, n=8, max_hits=0).df().collect()
    }
    assert drop_df == drop_list
    strip_list = {
        r["doc_id"]: r["text"]
        for r in CorpusPipeline(corpus, "doc_id", "text")
        .decontaminate_strip([BENCH], n=8).df().collect()
    }
    strip_df = {
        r["doc_id"]: r["text"]
        for r in CorpusPipeline(corpus, "doc_id", "text")
        .decontaminate_strip(bdf, n=8).df().collect()
    }
    assert strip_df == strip_list
    # bench_text_col passthrough (r13 review): a suite frame whose text
    # column is NOT named 'text' works on both steps
    bdf2 = spark.createDataFrame([(BENCH,)], "prompt string")
    drop_df2 = {
        r["doc_id"]
        for r in CorpusPipeline(corpus, "doc_id", "text")
        .decontaminate(bdf2, n=8, max_hits=0, bench_text_col="prompt")
        .df().collect()
    }
    assert drop_df2 == drop_list
    strip_df2 = {
        r["doc_id"]: r["text"]
        for r in CorpusPipeline(corpus, "doc_id", "text")
        .decontaminate_strip(bdf2, n=8, bench_text_col="prompt")
        .df().collect()
    }
    assert strip_df2 == strip_list
