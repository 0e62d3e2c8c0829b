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
is cluster-local — never corpus×corpus. Within a cell the default
``kernel="block"`` runs the `embedding_near_dup_pairs` phase-1 recipe
(blocked numpy matmul tiles over an applyInPandas group, margin-safe
candidates) and verifies only the survivors with the exact fold — so
the m²·dim bulk is vectorized while the verdict stays bit-identical to
the plain all-pairs fold join (``kernel="fold"``, kept as the
differential-certification form; the r7 10× probe measured the fold
join at 12× wall vs the kernel's near-flat slope). k still governs m:
the paper's k ≈ √n·C keeps cells task-sized as n grows; degenerate hot
cells are bounded by the same O(m·dim + block²) tile memory. The
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

import os

import numpy as np
import pandas as pd
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


def _cell_candidates_block(
    base: DataFrame, id_col: str, threshold: float, block: int
) -> DataFrame:
    """Intra-cell candidate pairs via blocked matmul tiles — the
    `similarity.embedding_near_dup_pairs` phase-1 kernel with cells as
    the buckets. Keeps every pair whose EXACT fold cosine could reach
    ``threshold`` (margin 1e-6 ≫ the ≲1e-15 relative fold-vs-matmul
    summation-order drift at these dims); the caller's exact-fold
    phase 2 makes the final verdict, so the composition is bit-identical
    to the all-pairs fold join while the m²·dim work runs as numpy
    matmuls, O(m·dim + block²) memory per task."""
    margin = 1e-6
    id_type = base.schema[id_col].dataType.simpleString()
    cand_schema = f"id_a {id_type}, id_b {id_type}"

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype(
                pdf[id_col].dtype
            )
        order = np.argsort(pdf[id_col].to_numpy(), kind="stable")
        ids = pdf[id_col].to_numpy()[order]
        V = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf["_v"].to_numpy()[order]]
        )
        nrm = pdf["_n"].to_numpy()[order]
        out_a, out_b = [], []
        for i0 in range(0, m, block):
            i1 = min(i0 + block, m)
            for j0 in range(i0, m, block):
                j1 = min(j0 + block, m)
                cos = (V[i0:i1] @ V[j0:j1].T) / np.outer(nrm[i0:i1], nrm[j0:j1])
                keep = cos >= threshold - margin
                if i0 == j0:
                    keep &= np.triu(np.ones_like(keep), k=1).astype(bool)
                ii, jj = np.nonzero(keep)
                out_a.append(ids[i0 + ii])
                out_b.append(ids[j0 + jj])
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )

    return base.select(id_col, "cell", "_v", "_n").groupBy("cell").applyInPandas(
        cell_pairs, cand_schema
    )


def semdedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    threshold: float = 0.95,
    fold_assign: bool = False,
    driver_max_edges: int | None = 100_000,
    kernel: str = "block",
    block: int = 2048,
    materialize_assignments: bool = False,
) -> DataFrame:
    """Per-embedding SemDeDup verdict:
    (``id_col``, cell, cent_cos, kept) — ``kept=0`` iff the row is a
    non-representative member of an intra-cluster duplicate group.

    ``threshold`` is the paper's 1−ε on pairwise cosine; the kept
    representative per group is argmin (cent_cos, id).

    ``kernel``: how intra-cell pairs are found. ``"block"`` (default,
    the scale path) generates margin-safe candidates with per-cell
    blocked matmul tiles and verifies ONLY the survivors with the exact
    fold — same verdicts bit-for-bit, but the m²·dim bulk runs as numpy
    instead of a Catalyst fold per pair (measured 12× at a 10× corpus).
    ``"fold"`` evaluates the exact fold on every intra-cell pair via a
    self-join — the plain oracle-shaped form, kept for differential
    certification of the kernel itself.

    ``materialize_assignments``: localCheckpoint the (id, cell, vec,
    norm, cent_cos) assignment frame before the pair stage. The frame is
    referenced 3-4× downstream (candidate generation, both verify-join
    sides, the final kept-join), and each reference otherwise replays the
    scan + the Arrow assignment kernel — the dominant fixed cost on small
    corpora, and a corpus-sized recompute at scale. Materializing it is
    what a production SemDeDup pass does anyway (the assignment IS the
    IVF index build). Off by default so plan-audit and the differential
    tests see the full lineage; skipped under SPARK_GRAFT_PLAN_AUDIT even
    when requested."""
    if kernel not in ("block", "fold"):
        raise ValueError(f"kernel must be 'block' or 'fold', got {kernel!r}")
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
    if materialize_assignments and not os.environ.get("SPARK_GRAFT_PLAN_AUDIT"):
        base = base.localCheckpoint()
    if kernel == "block":
        cand = _cell_candidates_block(base, id_col, threshold, block)
        va = base.select(
            F.col(id_col).alias("id_a"),
            F.col("_v").alias("_va"), F.col("_n").alias("_na"),
        )
        vb = base.select(
            F.col(id_col).alias("id_b"),
            F.col("_v").alias("_vb"), F.col("_n").alias("_nb"),
        )
        pairs = (
            cand.join(va, "id_a")
            .join(vb, "id_b")
            .where(
                dot_exact(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb"))
                >= F.lit(threshold)
            )
            .select("id_a", "id_b")
        )
    else:
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
