"""SemDeDup — semantic deduplication via k-means clustering + intra-
cluster embedding cosine (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication",
arXiv:2303.09540 — public).

Pipeline (the paper's, re-expressed Spark-first):

1. assign every embedding to its nearest k-means centroid (the coarse
   quantizer is an INPUT, as in `similarity.ivf_search` — fit offline /
   pinned for oracle certification);
2. within each cluster, connect pairs with cosine ≥ threshold
   (the paper's 1−ε) into semantic-duplicate groups (transitive
   closure, as in the reference implementation);
3. per group, KEEP the example with the LOWEST cosine to its cluster
   centroid — the paper's rule: edge-of-cluster examples carry more
   signal than the redundant core — and drop the rest. Ties break by
   id, so the verdict is total-order deterministic.

Scale shape: cluster assignment is one Arrow matvec kernel pass (no
shuffle); the ONLY shuffle keys by cell, so every pairwise comparison
is cluster-local — never corpus×corpus. Cluster sizes play the role
`embedding_near_dup_pairs` gives LSH buckets: k chosen so n/k rows fit
a task (the paper uses k ≈ √n·C; for degenerate hot cells the blocked-
matmul kernel of `embedding_near_dup_pairs` is the drop-in — this
module's exact-fold join path is the oracle-certifiable form). The
duplicate-group relabeling is pair-set-sized (`graph.connected_
components`: driver union-find under `driver_max_edges`, distributed
label propagation above). Cross-cluster near-dups are invisible by
construction — the paper's accepted recall tradeoff.

Determinism: with ``fold_assign=True`` and pinned centroid literals,
cell choice, centroid cosines, pair cosines, and therefore every
keep/drop verdict are bit-identical to a SQL oracle built from the
same literals (`similarity._nearest_cells_udf` fold semantics ≡ DuckDB
``list_reduce`` ≡ Spark ``F.aggregate``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .graph import connected_components
from .similarity import (
    _nearest_cells_udf,
    dot_exact,
    fold_sq_norms,
    norm_exact,
)

__all__ = ["semdedup"]


def semdedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    threshold: float = 0.95,
    fold_assign: bool = False,
    driver_max_edges: int | None = 100_000,
) -> DataFrame:
    """Per-embedding SemDeDup verdict:
    (``id_col``, cell, cent_cos, kept) — ``kept=0`` iff the row is a
    non-representative member of an intra-cluster duplicate group.

    ``threshold`` is the paper's 1−ε on pairwise cosine; the kept
    representative per group is argmin (cent_cos, id)."""
    spark = df.sparkSession
    c2 = fold_sq_norms(centroids)
    cents = F.broadcast(
        spark.createDataFrame(
            [(j, [float(x) for x in c], float(c2[j])) for j, c in enumerate(centroids)],
            "cell int, _cvec array<double>, _c2 double",
        )
    )
    assign1 = _nearest_cells_udf(centroids, 1, fold=fold_assign)
    base = df.select(
        F.col(id_col),
        F.col(vec_col).alias("_v"),
        norm_exact(F.col(vec_col)).alias("_n"),
        assign1(F.col(vec_col))[0].alias("cell"),
    ).join(cents, "cell")
    base = base.select(
        id_col,
        "cell",
        "_v",
        "_n",
        (dot_exact(F.col("_v"), F.col("_cvec")) / (F.col("_n") * F.sqrt(F.col("_c2")))).alias(
            "cent_cos"
        ),
    )
    a = base.select(
        F.col(id_col).alias("id_a"), "cell",
        F.col("_v").alias("_va"), F.col("_n").alias("_na"),
    )
    b = base.select(
        F.col(id_col).alias("id_b"), "cell",
        F.col("_v").alias("_vb"), F.col("_n").alias("_nb"),
    )
    pairs = (
        a.join(b, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (dot_exact(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))).alias(
                "_cos"
            ),
        )
        .where(F.col("_cos") >= F.lit(threshold))
        .select("id_a", "id_b")
    )
    comp = connected_components(
        pairs, "id_a", "id_b", driver_max_edges=driver_max_edges
    )
    members = comp.join(
        base.select(F.col(id_col).alias("node"), F.col("cent_cos").alias("_cc")),
        "node",
    )
    w = Window.partitionBy("component").orderBy(
        F.col("_cc").asc(), F.col("node").asc()
    )
    drop = (
        members.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") > 1)
        .select(F.col("node").alias(id_col), F.lit(0).alias("_kept"))
    )
    return (
        base.join(drop, id_col, "left")
        .select(
            id_col,
            "cell",
            "cent_cos",
            F.coalesce(F.col("_kept"), F.lit(1)).alias("kept"),
        )
    )
