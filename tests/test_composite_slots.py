"""Invariants of the r8 composite gate slots (beyond the oracle hash:
properties that must hold for ANY corpus, not just the gate fixtures)."""

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rows(spark):
    def get(name):
        return entry.queries()[name](spark, SF).collect()

    return get


def test_retrieval_recall_rows_are_sane(rows):
    rec = {r["key"]: (r["v1"], r["v2"]) for r in rows("retrieval") if r["section"] == "recall"}
    assert set(rec) == {"cosine_lsh@5", "cosine_ivf@5", "cosine_pq@5"}
    totals = {v2 for _, v2 in rec.values()}
    assert len(totals) == 1  # one shared exact-top-k denominator
    total = totals.pop()
    assert total > 0
    for key, (hits, _) in rec.items():
        assert 0 <= hits <= total, f"{key}: hits {hits} outside [0, {total}]"
    # IVF probes 3 of 8 cells and must find a nontrivial share; PQ is a
    # compressed-domain rerank of the full corpus and should do no worse
    # than chance either
    assert rec["cosine_ivf@5"][0] >= total // 4
    assert rec["cosine_pq@5"][0] >= total // 4


def test_series_models_sections_are_consistent(rows):
    out = rows("series_models")
    by = {}
    for r in out:
        by.setdefault(r["section"], []).append(r)
    assert set(by) == {"trend", "cusum_pos", "cusum_neg", "funnel", "retention"}
    # funnel counts are monotonically non-increasing down the steps
    steps = sorted((r["k1"], r["n"]) for r in by["funnel"])
    ns = [n for _, n in steps]
    assert ns == sorted(ns, reverse=True)
    # every (trend, cusum_pos, cusum_neg) triple shares the user's n
    n_by_user = {}
    for sec in ("trend", "cusum_pos", "cusum_neg"):
        for r in by[sec]:
            n_by_user.setdefault(r["k1"], set()).add(r["n"])
    assert all(len(v) == 1 for v in n_by_user.values())
    # retention offset-0 cells equal cohort sizes: Σ n at offset 0 = users
    total_users = sum(r["n"] for r in by["retention"] if r["k2"] == 0)
    assert total_users == len(n_by_user)
    # no NULLs anywhere except slope_nano (typed BIGINT null sanctioned)
    for r in out:
        for k, v in r.asDict().items():
            if v is None:
                assert r["section"] == "trend" and k == "v1"


def test_corpus_prep_sections_cover_corpus(rows, spark):
    out = rows("corpus_prep")
    secs = {}
    for r in out:
        secs.setdefault(r["section"], []).append(r)
    assert set(secs) == {
        "chunk", "pack", "mix", "dsir", "normtext", "bpe", "bpe_learn"
    }
    # bpe_learn rows ARE the learned merge table (r13): dense ranks from
    # 0, s1 = a␟b with non-empty halves
    learn = sorted(secs["bpe_learn"], key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in learn] == list(range(len(learn)))
    assert len(learn) >= 1
    for r in learn:
        a, b = r["s1"].split("\x1f")
        assert a and b
    from time_series_loader_spark.session import read_table

    n_docs = read_table(spark, SF, "documents").count()
    # mix / dsir / normtext are one row per doc
    for sec in ("mix", "dsir", "normtext"):
        assert len(secs[sec]) == n_docs, sec
    # bpe covers every doc plus the three fold-semantics canaries, and
    # a word never BPE-encodes to fewer than 1 or more than len tokens:
    # n_words <= n_bpe_tokens, with equality iff every word is 1 token
    assert len(secs["bpe"]) == n_docs + 3
    for r in secs["bpe"]:
        assert r["k2"] >= r["v1"] >= 0  # n_bpe_tokens >= n_words
    # pack segment lengths per doc sum to the doc's token count
    seg = {}
    for r in secs["pack"]:
        seg[r["doc_id"]] = seg.get(r["doc_id"], 0) + r["v3"]
    for r in secs["pack"]:
        assert seg[r["doc_id"]] == r["k2"]
    # dsir selects exactly min(K, n_docs) documents
    n_sel = sum(r["v2"] for r in secs["dsir"])
    assert n_sel == min(100, n_docs)
    # normtext md5s are distinct per doc (the hazard suffix is constant,
    # the doc texts differ) and 32 lowercase hex chars
    md5s = [r["s1"] for r in secs["normtext"]]
    assert len(set(md5s)) == len(md5s)
    assert all(len(h) == 32 and h == h.lower() for h in md5s)


def test_tfidf_canaries_match_direct_tokenization(rows, spark):
    """The __-prefixed canary rows must equal values computed directly
    from the engine tokenizer — they are the slot's tokenization
    checksum, so they must never drift from the real token stream."""
    from pyspark.sql import functions as F

    from time_series_loader_spark.operators.text import tokens
    from time_series_loader_spark.session import read_table

    out = rows("tfidf_top3")
    can = {r["term"]: r["score_u"] for r in out if r["term"].startswith("__")}
    docs = read_table(spark, SF, "documents")
    tf = (
        docs.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .count()
    )
    n_pairs = tf.count()
    vocab = tf.select("term").distinct()
    assert can["__n_pairs"] == n_pairs
    assert can["__vocab_size"] == vocab.count()
    assert can["__sum_tf"] == tf.agg(F.sum("count")).collect()[0][0]
    assert can["__sum_term_len"] == (
        vocab.agg(F.sum(F.length("term"))).collect()[0][0]
    )
    # 16 hex-bucket rows, counts summing to the vocabulary size
    hx = [r for r in out if r["term"].startswith("__md5_")]
    assert sum(r["tf"] for r in hx) == can["__vocab_size"]
    # detail rows: exactly top-3 per doc, no NULL terms anywhere
    detail = [r for r in out if not r["term"].startswith("__")]
    assert all(r["term"] is not None for r in out)
    per_doc = {}
    for r in detail:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + 1
    assert all(c <= 3 for c in per_doc.values())


def test_env_pins_are_fresh(spark):
    """resources/env_pins.json must equal a LIVE recomputation on this
    box: a stale pin (library upgraded, JVM swapped, pins generated on a
    different machine) would turn the env_fingerprint slot red for the
    wrong reason — this test catches the drift at commit time, where it
    can be answered by rerunning tools/gen_env_pins.py."""
    import json

    from time_series_loader_spark.operators.ln_pinned import LN_U_PATH
    import os

    from tools.gen_env_pins import compute_pins

    with open(os.path.join(os.path.dirname(LN_U_PATH), "env_pins.json")) as fh:
        committed = json.load(fh)
    live = compute_pins(spark)
    assert live == committed, {
        k: (committed.get(k), live.get(k))
        for k in set(committed) | set(live)
        if committed.get(k) != live.get(k)
    }


def test_bench_reset_is_safe_between_memoizing_slots(spark):
    """bench.py calls entry.bench_reset between slots; the memos that
    hold checkpointed DataFrames (_DEDUP_STORES, _DSIR_FIT) must be
    evicted by it, not just unpersisted — a dangling memo entry crashes
    the next invocation with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND
    (reproduced in the first r10 bench run)."""
    a1 = entry.q_dsir_select(spark, SF).collect()
    d1 = entry.queries()["dedup_incremental"](spark, SF).count()
    entry.bench_reset(spark)
    assert entry._DSIR_FIT == {} and entry._DEDUP_STORES == {}
    a2 = entry.q_dsir_select(spark, SF).collect()  # rebuilds, no crash
    d2 = entry.queries()["dedup_incremental"](spark, SF).count()
    assert sorted(map(tuple, a1)) == sorted(map(tuple, a2))
    assert d1 == d2
