"""Incremental (batch-vs-store) dedup: unit semantics + differential
equivalence against a full-corpus rerun.

The contract under test (dedup.incremental_dedup docstring): with ids
monotone across batches, the batch docs that survive an incremental pass
against a store are EXACTLY the batch docs a full-corpus pipeline
(exact dedup → minhash-LSH pairs → keep_representatives) would keep.
"""

import pytest
from pyspark.sql import functions as F

from time_series_loader_spark.operators.dedup import (
    dedup_exact,
    doc_signatures,
    incremental_dedup,
    minhash_lsh_pairs,
)
from time_series_loader_spark.operators.graph import keep_representatives

LSH = dict(n=3, num_hashes=16, bands=4, threshold=0.5)


def _store_of(spark, df):
    """Signature store of a (already retained) corpus frame."""
    return doc_signatures(df, "text", "doc_id", n=LSH["n"], num_hashes=LSH["num_hashes"])


def _full_survivors(df):
    """Full-corpus pipeline: exact reps → LSH pairs → component reps."""
    reps = dedup_exact(df, ["text"], "doc_id").select("doc_id")
    kept = df.join(reps, "doc_id")
    pairs = minhash_lsh_pairs(kept, "text", "doc_id", **LSH)
    return {
        r["doc_id"]
        for r in keep_representatives(kept, pairs, "doc_id").select("doc_id").collect()
    }


def _incr_survivors(spark, store_df, batch_df):
    out = incremental_dedup(batch_df, _store_of(spark, store_df), "text", "doc_id", **LSH)
    return {r["doc_id"] for r in out.select("doc_id").collect()}


def test_exact_rules(spark):
    store = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id BIGINT, text STRING",
    )
    batch = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta"),  # exact dup of store 1
            (11, "totally fresh words nothing shared here"),
            (12, "totally fresh words nothing shared here"),  # in-batch dup of 11
        ],
        "doc_id BIGINT, text STRING",
    )
    assert _incr_survivors(spark, store, batch) == {11}


def test_near_dup_vs_store(spark):
    store = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today")],
        "doc_id BIGINT, text STRING",
    )
    batch = spark.createDataFrame(
        [
            # near-dup of store doc (one word changed)
            (10, "the quick brown fox jumps over the lazy cat today"),
            (11, "an unrelated essay about distributed query engines"),
        ],
        "doc_id BIGINT, text STRING",
    )
    assert _incr_survivors(spark, store, batch) == {11}


def test_contaminated_component_drops_chain(spark):
    """X ~ store-S and Y ~ X but Y !~ S: a full rerun evicts BOTH (the
    component's representative is S); the incremental contamination rule
    must reproduce that, not just drop X."""
    base = ["w%02d" % i for i in range(24)]
    s = " ".join(base)
    x = " ".join(base[:-4] + ["xx%d" % i for i in range(4)])  # trailing edit ~ s
    y = " ".join(["yy%d" % i for i in range(3)] + base[3:-4] + ["xx%d" % i for i in range(4)])  # leading edit ~ x, far from s
    store = spark.createDataFrame([(1, s)], "doc_id BIGINT, text STRING")
    batch = spark.createDataFrame(
        [(10, x), (11, y), (12, "entirely different content about parquet files")],
        "doc_id BIGINT, text STRING",
    )
    # precondition: the chain actually exists at these LSH settings and
    # y-vs-store is NOT a direct hit (else the test tests nothing)
    union = store.union(batch)
    pair_set = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(union, "text", "doc_id", **LSH).collect()
    }
    assert (1, 10) in pair_set and (10, 11) in pair_set
    assert (1, 11) not in pair_set
    assert _incr_survivors(spark, store, batch) == {12}


def test_short_docs_exact_only(spark):
    """Docs below the shingle width (<n tokens) carry NULL minhash columns:
    exact dedup still applies, band joins must not explode on them."""
    store = spark.createDataFrame(
        [(1, "hi there friendly parquet reader"), (2, None)],
        "doc_id BIGINT, text STRING",
    )
    batch = spark.createDataFrame(
        [
            (10, "hi there friendly parquet reader"),
            (11, "bye now"),
            (12, None),
            (13, ""),
        ],
        "doc_id BIGINT, text STRING",
    )
    # 10 exact-dups store 1; 12 (null) exact-dups store 2 (digest of ' ');
    # 11 (2 tokens < n → no shingles) and 13 are unique and unpaired
    assert _incr_survivors(spark, store, batch) == {11, 13}
    # store schema carries null mh for the null-text doc
    st = _store_of(spark, store)
    mh0 = {r["doc_id"]: r["mh0"] for r in st.collect()}
    assert mh0[2] is None and mh0[1] is not None


def test_store_extension_roundtrip(spark):
    """Survivors carry digest + mh columns so the store extends without
    recomputation, and the extended store then blocks a re-submit."""
    store0 = spark.createDataFrame(
        [(1, "seed document with some stable words inside")],
        "doc_id BIGINT, text STRING",
    )
    batch1 = spark.createDataFrame(
        [(10, "brand new content for the first increment batch")],
        "doc_id BIGINT, text STRING",
    )
    store = _store_of(spark, store0)
    out1 = incremental_dedup(batch1, store, "text", "doc_id", **LSH)
    mh_cols = [f"mh{i}" for i in range(LSH["num_hashes"])]
    store2 = store.unionByName(out1.select("doc_id", "digest", *mh_cols))
    # re-submitting the same text (new id) is now an exact dup
    batch2 = spark.createDataFrame(
        [(20, "brand new content for the first increment batch"),
         (21, "yet another genuinely novel document body")],
        "doc_id BIGINT, text STRING",
    )
    out2 = incremental_dedup(batch2, store2, "text", "doc_id", **LSH)
    assert {r["doc_id"] for r in out2.select("doc_id").collect()} == {21}


@pytest.mark.parametrize("split", [0.5, 0.8])
def test_differential_vs_full_rerun(spark, sf_dir, split):
    """On the real documents table: survivors of (store ∪ batch) full
    rerun, restricted to batch ids, == incremental survivors. The store
    here is itself bootstrap-deduplicated first (a well-formed store),
    and the id split is monotone (store ids < batch ids)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    cut = ids[int(len(ids) * split)]
    past, batch = docs.where(F.col("doc_id") < cut), docs.where(F.col("doc_id") >= cut)

    # bootstrap: dedup the historical corpus, store its survivors' sigs
    past_kept_ids = _full_survivors(past)
    past_kept = past.where(F.col("doc_id").isin(list(past_kept_ids)))

    incr = _incr_survivors(spark, past_kept, batch)
    full = _full_survivors(docs)
    assert incr == {i for i in full if i >= cut}


def test_signature_column_clash_raises(spark):
    df = spark.createDataFrame(
        [(1, "some text here", "x")], "doc_id BIGINT, text STRING, digest STRING"
    )
    with pytest.raises(ValueError, match="digest"):
        doc_signatures(df, "text", "doc_id")
