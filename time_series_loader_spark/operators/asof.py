"""Nearest-timestamp as-of join (J1).

Parity target: reference ``load_file.py:2207-2230`` — for each target grid
timestamp, take the data row whose timestamp minimizes ``abs(ts - target)``
(an O(grid × rows) scan there).

Spark lacks a native as-of join. This is the union-of-timelines composition
(SURVEY.md §2.3 option (a)):

1. union the target timestamps (tagged) with the data timestamps;
2. one ordered window pass computes, at every position, the previous and
   next data value + timestamp (``last ignorenulls`` forward / backward);
3. each target row picks whichever neighbor is nearer (ties → earlier row,
   matching a stable scan).

Cost: one sort-shuffle over targets+data — O((n+m) log p) distributed, vs
the reference's O(n·m) loop. Keyed by ``group_cols`` when a series key
exists; direction='backward'/'forward' variants come free by picking only
that neighbor.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_nearest(
    targets: DataFrame,
    data: DataFrame,
    ts_col: str,
    value_cols: Sequence[str],
    group_cols: Sequence[str] = (),
    direction: str = "nearest",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Join ``value_cols`` from ``data`` onto ``targets`` by nearest ts.

    ``direction``: 'nearest' | 'backward' (last value at/before target) |
    'forward' (first value at/after target) — pd.merge_asof parity.
    """
    if direction not in ("nearest", "backward", "forward"):
        raise ValueError(f"direction must be nearest|backward|forward, got {direction!r}")
    gcols = list(group_cols)
    tagged_t = targets.select(
        *gcols, ts_col, F.lit(1).alias("_is_target"), *[F.lit(None).alias(c) for c in value_cols]
    )
    tagged_d = data.select(
        *gcols, ts_col, F.lit(0).alias("_is_target"), *value_cols
    )
    u = tagged_t.unionByName(tagged_d)

    # ONE ascending sort serves both directions: the backward neighbor is
    # last-non-null over (unbounded preceding, 0); the forward neighbor is
    # first-non-null over (1, unbounded following) on the SAME ordering —
    # Spark keeps a single Sort and evaluates both frames in one pass.
    # Data rows sort before target rows at equal ts, so an exact-ts match
    # lands on the backward side (d_prev == 0); the forward direction
    # recovers exact matches from there (allow_exact_matches parity).
    order = [F.col(ts_col).asc(), F.col("_is_target").asc()]
    w = Window.partitionBy(*gcols).orderBy(*order) if gcols else Window.orderBy(*order)
    w_back = w.rowsBetween(Window.unboundedPreceding, 0)
    w_fwd = w.rowsBetween(1, Window.unboundedFollowing)

    data_ts = F.when(F.col("_is_target") == 0, F.col(ts_col))
    cols = u.columns
    enriched = u.select(
        *cols,
        F.last(data_ts, ignorenulls=True).over(w_back).alias("_prev_ts"),
        F.first(data_ts, ignorenulls=True).over(w_fwd).alias("_next_ts"),
        *[
            F.last(F.when(F.col("_is_target") == 0, F.col(c)), ignorenulls=True)
            .over(w_back)
            .alias(f"_prev_{c}")
            for c in value_cols
        ],
        *[
            F.first(F.when(F.col("_is_target") == 0, F.col(c)), ignorenulls=True)
            .over(w_fwd)
            .alias(f"_next_{c}")
            for c in value_cols
        ],
    ).where(F.col("_is_target") == 1)

    t = F.col(ts_col).cast("double")
    d_prev = t - F.col("_prev_ts").cast("double")
    d_next = F.col("_next_ts").cast("double") - t
    exact = F.col("_prev_ts").isNotNull() & (d_prev == 0)

    if direction == "backward":
        use_prev = F.col("_prev_ts").isNotNull()
    elif direction == "forward":
        use_prev = exact  # exact-ts match counts as the forward neighbor
    else:
        # nearest: prefer the earlier (prev) side on exact ties
        use_prev = F.col("_prev_ts").isNotNull() & (
            F.col("_next_ts").isNull() | (d_prev <= d_next)
        )

    if tolerance_seconds is not None:
        tol = F.lit(float(tolerance_seconds))
        prev_ok = F.col("_prev_ts").isNotNull() & (d_prev <= tol)
        next_ok = F.col("_next_ts").isNotNull() & (d_next <= tol)
    else:
        prev_ok = F.col("_prev_ts").isNotNull()
        next_ok = F.col("_next_ts").isNotNull()

    picked = []
    for c in value_cols:
        prev_v = F.when(prev_ok, F.col(f"_prev_{c}"))
        next_v = F.when(next_ok, F.col(f"_next_{c}"))
        if direction == "backward":
            expr = prev_v
        else:
            expr = F.when(use_prev & prev_ok, prev_v).otherwise(next_v)
        picked.append(expr.alias(c))

    return enriched.select(*gcols, ts_col, *picked)
