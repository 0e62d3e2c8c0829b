"""SemDeDup (operators/semdedup.py) vs a pure-Python reference of the
Abbas et al. 2023 pipeline (assign → intra-cluster pairs → transitive
groups → keep argmin centroid-cosine)."""

import math

import numpy as np
import pytest

from time_series_loader_spark.operators.semdedup import semdedup

CENTS = [[1.0, 0.0], [0.0, 1.0]]


def _cos(a, b):
    na, nb = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(x * x for x in b))
    return sum(x * y for x, y in zip(a, b)) / (na * nb)


def _py_semdedup(rows, cents, thr):
    """rows: [(id, vec)] → {id: (cell, kept)}"""
    cell = {}
    for i, v in rows:
        d = [sum(c * c for c in cvec) - 2 * sum(x * c for x, c in zip(v, cvec))
             for cvec in cents]
        cell[i] = int(np.argmin(d))
    parent = {i: i for i, _ in rows}

    def find(x):
        while parent[x] != x:
            x = parent[x]
        return x

    vec = dict(rows)
    ids = sorted(vec)
    for a in ids:
        for b in ids:
            if a < b and cell[a] == cell[b] and _cos(vec[a], vec[b]) >= thr:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    groups = {}
    for i in ids:
        groups.setdefault(find(i), []).append(i)
    kept = {}
    for members in groups.values():
        if len(members) == 1:
            kept[members[0]] = 1
            continue
        rep = min(members, key=lambda i: (_cos(vec[i], cents[cell[i]]), i))
        for i in members:
            kept[i] = 1 if i == rep else 0
    return {i: (cell[i], kept[i]) for i in ids}


ROWS = [
    (0, [1.0, 0.1]),     # cell 0, dup group {0,1,2}
    (1, [1.0, 0.11]),
    (2, [0.99, 0.1]),
    (3, [1.0, 0.9]),     # cell 0 boundary-ish, not a dup of 0-2 at 0.999
    (4, [0.1, 1.0]),     # cell 1, dup group {4,5}
    (5, [0.1, 1.001]),
    (6, [-1.0, 0.5]),    # cell 1, alone
]
THR = 0.999


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in ROWS],
        "vec_id long, embedding array<float>",
    )


def test_matches_python_reference(spark, emb_df):
    out = {
        r["vec_id"]: (r["cell"], r["kept"])
        for r in semdedup(
            emb_df, "vec_id", "embedding", CENTS, threshold=THR,
            fold_assign=True,
        ).collect()
    }
    # reference uses the float32-roundtripped vectors Spark stores
    rows32 = [
        (i, list(np.asarray(v, dtype=np.float32).astype(np.float64)))
        for i, v in ROWS
    ]
    ref = _py_semdedup(rows32, CENTS, THR)
    assert out == ref
    # the scenario is non-trivial: some drops, some survivors
    assert sum(1 for _, k in out.values() if k == 0) >= 2
    assert sum(1 for _, k in out.values() if k == 1) >= 4


def test_representative_is_lowest_centroid_cos(spark, emb_df):
    out = semdedup(
        emb_df, "vec_id", "embedding", CENTS, threshold=THR, fold_assign=True
    ).collect()
    by_id = {r["vec_id"]: r for r in out}
    grp = [by_id[i] for i in (0, 1, 2)]
    keepers = [r for r in grp if r["kept"] == 1]
    assert len(keepers) == 1
    assert keepers[0]["cent_cos"] == min(r["cent_cos"] for r in grp)


def test_cross_cluster_dups_invisible(spark):
    """Two near-identical vectors straddling the cell boundary land in
    different cells and BOTH survive — the paper's recall tradeoff,
    asserted so the semantics stay honest."""
    df = spark.createDataFrame(
        [(0, [1.0, 0.999]), (1, [0.999, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = semdedup(df, "vec_id", "embedding", CENTS, threshold=0.9,
                   fold_assign=True).collect()
    assert sorted(r["cell"] for r in out) == [0, 1]
    assert all(r["kept"] == 1 for r in out)


def test_threshold_one_keeps_everything_distinct(spark, emb_df):
    out = semdedup(
        emb_df, "vec_id", "embedding", CENTS, threshold=1.0000001,
        fold_assign=True,
    ).collect()
    assert all(r["kept"] == 1 for r in out)


def test_pinned_centroids_on_testdata(spark, sf_dir):
    from time_series_loader_spark.operators.ivf_pinned import IVF_CENTROIDS
    from time_series_loader_spark.session import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    out = semdedup(
        emb, "vec_id", "embedding", IVF_CENTROIDS, threshold=0.45,
        fold_assign=True,
    )
    rows = out.collect()
    assert len(rows) == emb.count()
    assert {r["kept"] for r in rows} <= {0, 1}
    # verdicts are deterministic across a second run
    again = {(r["vec_id"], r["kept"]) for r in out.collect()}
    assert again == {(r["vec_id"], r["kept"]) for r in rows}


def test_block_kernel_bit_equals_fold(spark, sf_dir):
    """kernel='block' (margin matmul candidates + fold verify) must be
    bit-identical to kernel='fold' (all-pairs exact fold) — the scale
    path IS the certified path."""
    from time_series_loader_spark.operators.ivf_pinned import IVF_CENTROIDS
    from time_series_loader_spark.session import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    kw = dict(threshold=0.45, fold_assign=True)
    fold = {
        (r["vec_id"], r["cell"], r["cent_cos"], r["kept"])
        for r in semdedup(
            emb, "vec_id", "embedding", IVF_CENTROIDS, kernel="fold", **kw
        ).collect()
    }
    blk = {
        (r["vec_id"], r["cell"], r["cent_cos"], r["kept"])
        for r in semdedup(
            emb, "vec_id", "embedding", IVF_CENTROIDS, kernel="block", **kw
        ).collect()
    }
    assert blk == fold
    # and with a tile size that forces multi-tile paths inside a cell
    tiny = {
        (r["vec_id"], r["kept"])
        for r in semdedup(
            emb, "vec_id", "embedding", IVF_CENTROIDS, kernel="block",
            block=16, **kw
        ).collect()
    }
    assert tiny == {(v, k) for v, _, _, k in fold}


def test_bad_kernel(spark, emb_df):
    with pytest.raises(ValueError, match="kernel"):
        semdedup(emb_df, "vec_id", "embedding", CENTS, kernel="nope")
