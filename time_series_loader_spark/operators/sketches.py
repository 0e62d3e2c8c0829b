"""Mergeable distinct-count sketches — the pre-aggregation pattern that
makes interactive analytics on 100 TB possible.

A raw `COUNT(DISTINCT user)` over an arbitrary date range re-shuffles the
raw corpus every time. The sketch pattern materializes one small HLL
(Apache DataSketches, exposed by Spark's ``hll_sketch_agg`` family) per
(bucket, dimension) ONCE, persists the binary column to parquet, and
answers any later rollup by unioning sketches — register-wise max, so
``union(sketch(A), sketch(B)) ≡ sketch(A ∪ B)`` EXACTLY (same lg_k and
hash): merging per-day sketches gives the identical estimate a direct
scan would, at zero raw-data cost (test-pinned in test_sketches).

Scale shape: building is one groupBy with map-side partial sketches
(each partition folds its rows into a local sketch; the shuffle carries
lg_k-sized binaries, not rows). Merging is an aggregate over
bucket-count-many small binaries — dashboard-cheap. Estimates are
DataSketches-deterministic: partition- and order-independent for a
fixed input multiset.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_rollup(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str],
    lg_k: int = 12,
) -> DataFrame:
    """Per-group HLL sketches of ``key_col``'s distinct values.

    Output: ``group_cols`` + ``sketch`` (BINARY — persistable to
    parquet) + ``n_distinct_est`` (BIGINT estimate for direct use).
    ``lg_k`` trades size for accuracy (2^lg_k registers; 12 → ~1.6 KB,
    ~2% relative standard error). All downstream merges must use the
    same ``lg_k`` family (DataSketches unions downgrade mixed
    precisions to the coarsest — keep one value pipeline-wide).
    """
    sk = F.hll_sketch_agg(F.col(key_col), F.lit(lg_k))
    return df.groupBy(*group_cols).agg(
        sk.alias("sketch"),
        F.hll_sketch_estimate(sk).alias("n_distinct_est"),
    )


def hll_merge(
    sketches: DataFrame,
    group_cols: Sequence[str] = (),
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union previously-materialized sketches into coarser groups (or
    one global row when ``group_cols`` is empty) and estimate.

    Output: ``group_cols`` + ``sketch`` (the merged binary — itself
    re-mergeable, so rollup hierarchies compose) + ``n_distinct_est``.
    """
    merged = F.hll_union_agg(F.col(sketch_col))
    aggs = [
        merged.alias("sketch"),
        F.hll_sketch_estimate(merged).alias("n_distinct_est"),
    ]
    if group_cols:
        return sketches.groupBy(*group_cols).agg(*aggs)
    return sketches.agg(*aggs)
