"""Deterministic value-based time bucketing.

The building block for distributing *unkeyed* ordered operators (diff,
fills, as-of) that would otherwise funnel through one partition: assign
each row a bucket id that is a PURE FUNCTION of its timestamp (no sampling
— repeated evaluations of the subtree always agree), run the per-bucket
window, then stitch bucket boundaries with a tiny prefix-scanned carry
table (buckets are few — one per shuffle partition's worth of time range).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def time_bucket_column(
    ts_col: str, lo: float, span: float, n: int
) -> Column:
    """Bucket id 0..n-1, monotone in ts: floor((ts - lo) / (span / n))."""
    return F.least(
        F.lit(n - 1),
        F.floor((F.col(ts_col).cast("double") - F.lit(lo)) / F.lit(span / n)),
    ).cast("int")


def time_span(df: DataFrame, ts_col: str) -> tuple[float | None, float | None]:
    b = df.agg(
        F.min(ts_col).cast("double").alias("lo"),
        F.max(ts_col).cast("double").alias("hi"),
    ).collect()[0]
    return b["lo"], b["hi"]
