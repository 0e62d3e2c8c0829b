"""Product quantization (operators/pq.py): encode/search semantics,
recall on clustered data, and python-reference parity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from time_series_loader_spark.operators.pq import pq_encode, pq_search, pq_train

DIM = 16
M = 4
KSUB = 4


def _clustered(seed_centers=8, per=25, noise=0.05):
    """Deterministic clustered vectors: centers from a fixed integer
    lattice, points = center + small deterministic offsets. Cluster ids
    INTERLEAVE with vec_id (ci = vid % centers) so min-id k-means init
    (the engine's deterministic init rule) sees distinct clusters — a
    block layout would hand every init centroid to cluster 0 and
    degenerate the coarse quantizer."""
    rows = []
    for vid in range(seed_centers * per):
        ci = vid % seed_centers
        # ci·5 is invertible mod 11 → all `seed_centers` ≤ 11 centers are
        # DISTINCT in every dim (a mod-7 lattice made clusters 0 and 7
        # identical, which silently broke nearest-cluster assertions)
        center = np.array(
            [((ci * 5 + d * 3) % 11) - 5.0 for d in range(DIM)], dtype=np.float64
        )
        off = np.array(
            [(((vid * 13 + d) % 5) - 2) * noise for d in range(DIM)],
            dtype=np.float64,
        )
        rows.append((vid, ci, [float(x) for x in center + off]))
    return rows


@pytest.fixture(scope="module")
def clustered(spark):
    return spark.createDataFrame(
        _clustered(), "vec_id LONG, cluster LONG, embedding ARRAY<DOUBLE>"
    )


def test_pq_train_shapes_and_determinism(spark, clustered):
    b1 = pq_train(clustered, "vec_id", "embedding", m=M, ksub=KSUB, iters=2)
    b2 = pq_train(clustered, "vec_id", "embedding", m=M, ksub=KSUB, iters=2)
    assert len(b1) == M and len(b1[0]) == KSUB and len(b1[0][0]) == DIM // M
    assert b1 == b2  # rerun on the same partitioning is bit-identical
    # across partitionings the partial-mean merge order shifts → ~ulp
    # drift only (the pinned-codebook contract absorbs this: fit once,
    # round, freeze)
    b3 = pq_train(clustered.repartition(5), "vec_id", "embedding", m=M, ksub=KSUB, iters=2)
    assert np.allclose(np.asarray(b1), np.asarray(b3), atol=1e-9)

    with pytest.raises(ValueError, match="not divisible"):
        pq_train(clustered, "vec_id", "embedding", m=3)


def test_pq_encode_matches_numpy_reference(spark, clustered):
    books = pq_train(clustered, "vec_id", "embedding", m=M, ksub=KSUB, iters=2)
    codes = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(clustered, "vec_id", "embedding", books).collect()
    }
    C = np.asarray(books)
    dsub = DIM // M
    for vid, _, vec in _clustered()[:50]:
        v = np.asarray(vec)
        want = []
        for j in range(M):
            d = ((C[j] - v[j * dsub : (j + 1) * dsub][None, :]) ** 2).sum(axis=1)
            want.append(int(np.argmin(d)))
        assert codes[vid] == want, vid
    # codes are partitioning-independent
    codes2 = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(clustered.repartition(7), "vec_id", "embedding", books).collect()
    }
    assert codes == codes2


def test_pq_search_finds_the_right_cluster(spark, clustered):
    """On clustered data (the case PQ exists for), every ADC neighbor
    must come from the query's own cluster. (Exact point-for-point
    recall vs L2 is NOT the contract: within-cluster noise quantizes to
    identical codes, so ADC ties collapse to id order — the code's own
    rule — while exact L2 ranks by noise. Cluster membership is the
    semantic claim; identical-to-oracle scoring is checked in the gate
    query.)"""
    books = pq_train(clustered, "vec_id", "embedding", m=M, ksub=KSUB, iters=3)
    queries = clustered.where(F.col("vec_id") % 50 == 0)
    corpus = clustered.where(F.col("vec_id") % 50 != 0)
    codes = pq_encode(corpus, "vec_id", "embedding", books)
    got = pq_search(queries, codes, "vec_id", "embedding", books, k=5)
    cluster_of = {vid: ci for vid, ci, _ in _clustered()}
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == 4  # vec_ids 0, 50, 100, 150... within 200 rows
    for qid, rows in by_q.items():
        assert sorted(r["rank"] for r in rows) == [1, 2, 3, 4, 5]
        for r in rows:
            assert cluster_of[r["neighbor_id"]] == cluster_of[qid], (qid, r)


def test_pq_search_local_topk_is_globally_exact(spark, clustered):
    """Per-partition top-k + global window == global top-k over all
    candidates (top-k of a union of local top-ks)."""
    books = pq_train(clustered, "vec_id", "embedding", m=M, ksub=KSUB, iters=2)
    queries = clustered.where(F.col("vec_id") == 0)
    corpus = clustered.where(F.col("vec_id") != 0)
    one = pq_search(
        queries, pq_encode(corpus, "vec_id", "embedding", books).coalesce(1),
        "vec_id", "embedding", books, k=7,
    ).collect()
    many = pq_search(
        queries, pq_encode(corpus.repartition(13), "vec_id", "embedding", books),
        "vec_id", "embedding", books, k=7,
    ).collect()
    key = lambda rows: [(r["query_id"], r["neighbor_id"], r["rank"]) for r in
                        sorted(rows, key=lambda r: (r["query_id"], r["rank"]))]
    assert key(one) == key(many)


def test_pq_code_table_is_compact(spark, clustered):
    books = pq_train(clustered, "vec_id", "embedding", m=M, ksub=KSUB, iters=1)
    codes = pq_encode(clustered, "vec_id", "embedding", books)
    row = codes.first()
    assert len(row["codes"]) == M
    assert all(0 <= c < KSUB for c in row["codes"])


def test_ivfpq_reduces_to_pq_at_full_probe_and_prunes_otherwise(spark, clustered):
    from time_series_loader_spark.operators.pq import ivfpq_search
    from time_series_loader_spark.operators.similarity import (
        _nearest_cells_udf,
        kmeans_cells,
    )

    books = pq_train(clustered, "vec_id", "embedding", m=M, ksub=KSUB, iters=2)
    cents = kmeans_cells(clustered, "vec_id", "embedding", n_cells=8, iters=2)
    queries = clustered.where(F.col("vec_id") % 50 == 0)
    corpus = clustered.where(F.col("vec_id") % 50 != 0)
    assign1 = _nearest_cells_udf(cents, 1)
    codes = pq_encode(corpus, "vec_id", "embedding", books).join(
        corpus.select("vec_id", assign1(F.col("embedding"))[0].alias("cell")), "vec_id"
    )

    # n_probe = n_cells → identical to plain PQ search
    full = ivfpq_search(
        queries, codes, "vec_id", "embedding", cents, books, k=5, n_probe=8
    ).collect()
    plain = pq_search(queries, codes, "vec_id", "embedding", books, k=5).collect()
    key = lambda rows: sorted(
        (r["query_id"], r["neighbor_id"], r["rank"]) for r in rows
    )
    assert key(full) == key(plain)

    # n_probe = 1: every neighbor must come from the query's own probe
    # cell, and (clustered data) still from the query's own cluster
    one = ivfpq_search(
        queries, codes, "vec_id", "embedding", cents, books, k=5, n_probe=1
    )
    cluster_of = {vid: ci for vid, ci, _ in _clustered()}
    for r in one.collect():
        assert cluster_of[r["neighbor_id"]] == cluster_of[r["query_id"]]


def test_fold_and_matmul_paths_agree_on_ranks(spark, clustered):
    """fold=True (oracle-parity cumsum arithmetic) and the fast matmul
    path may differ in last-ulp float details but must produce the SAME
    codes and neighbor rankings on separated data."""
    books = pq_train(clustered, "vec_id", "embedding", m=M, ksub=KSUB, iters=2)
    queries = clustered.where(F.col("vec_id") % 50 == 0)
    corpus = clustered.where(F.col("vec_id") % 50 != 0)
    c_fast = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(corpus, "vec_id", "embedding", books, fold=False).collect()
    }
    c_fold = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(corpus, "vec_id", "embedding", books, fold=True).collect()
    }
    assert c_fast == c_fold

    def ranks(fold):
        codes = pq_encode(corpus, "vec_id", "embedding", books, fold=fold)
        return sorted(
            (r["query_id"], r["rank"], r["neighbor_id"])
            for r in pq_search(queries, codes, "vec_id", "embedding", books,
                               k=5, fold=fold).collect()
        )

    assert ranks(False) == ranks(True)
