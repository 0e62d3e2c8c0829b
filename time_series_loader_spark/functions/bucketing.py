"""Deterministic value-based time bucketing.

The building block for distributing *unkeyed* ordered operators (diff,
fills, as-of) that would otherwise funnel through one partition: assign
each row a bucket id that is a PURE FUNCTION of its timestamp (no sampling
— repeated evaluations of the subtree always agree), run the per-bucket
window, then stitch bucket boundaries with a tiny prefix-scanned carry
table (buckets are few — one per shuffle partition's worth of time range).

r7 note: the bucket id is computed in INTEGER microseconds. Results are
provably bucketing-invariant (the boundary-carry stitch; certified by the
perturbed-session gate), so a float here could never flip an output — but
oracle-gated plans carry a "no engine-evaluated floats" audit, and integer
epoch-µs arithmetic costs nothing while making the routing exact too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def time_bucket_column(
    ts_col: str, lo: int, span: int, n: int
) -> Column:
    """Bucket id 0..n-1, monotone in ts: ((us - lo) * n) div span, capped.

    Pure int64: (span ≤ ~292 years in µs) × n ≤ 2^63 for any realistic
    partition count; `div` truncation equals floor because us ≥ lo.
    """
    return F.least(
        F.lit(n - 1),
        F.expr(
            f"(unix_micros(`{ts_col}`) - {int(lo)}L) * {int(n)}L div {int(span)}L"
        ),
    ).cast("int")


def time_span(df: DataFrame, ts_col: str) -> tuple[int | None, int | None]:
    """(min, max) of the timestamp column in epoch MICROSECONDS (exact
    integers — no double round-trip)."""
    b = df.agg(
        F.min(F.unix_micros(F.col(ts_col))).alias("lo"),
        F.max(F.unix_micros(F.col(ts_col))).alias("hi"),
    ).collect()[0]
    return b["lo"], b["hi"]
