"""Behavioral analytics over event streams: conversion funnels and
cohort retention — the product-analytics half of an events engine
(beyond-reference; the reference loads series, this answers the
questions teams load them for).

Both operators are integer-pure by construction (epoch-µs bucket
arithmetic, counts — no floats anywhere), so their gate sections hash
identically on any engine.

Scale shape: everything reduces to user-level aggregates. Funnels
filter to the step event-types FIRST (nothing else shuffles), then
resolve each step as a "min timestamp strictly after the previous
step" conditional aggregate with the user-level frame broadcast back —
k steps = k user-sized broadcast joins over one filtered scan lineage,
never a per-event window. Retention is two groupBys (user cohort,
user-week activity) joined on the user-sized side.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_US_PER_WEEK = 7 * 86400 * 1_000_000


def funnel_steps(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Ordered conversion funnel: how many users performed ``steps[0]``,
    then ``steps[1]`` STRICTLY AFTER their first ``steps[0]``, then
    ``steps[2]`` strictly after that first qualifying ``steps[1]``, …
    (the standard first-touch funnel definition).

    Output: one row per step — (``step`` BIGINT 1-based index,
    ``event_type`` STRING, ``n_users`` BIGINT), n_users monotonically
    non-increasing down the funnel.

    Scale shape: one scan filtered to the step types; step i is a
    conditional min-aggregate per user joined against the (user, t_{i-1})
    frame — user-cardinality-sized, AQE-broadcast — so k steps cost k
    cheap aggregates over the SAME filtered lineage and no event-level
    window or self-join ever forms.
    """
    if len(steps) < 2:
        raise ValueError("funnel_steps: need at least two steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel_steps: steps must be distinct event types")
    ev = df.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_t"),
        F.col(ts_col).alias("_ts"),
    ).where(F.col(type_col).isin(list(steps)))
    # step 1: first occurrence per user
    reached = ev.where(F.col("_t") == steps[0]).groupBy("_u").agg(
        F.min("_ts").alias("_prev")
    )
    counts = [(1, steps[0], reached)]
    for i, s in enumerate(steps[1:], start=2):
        nxt = (
            # user-cardinality side: AQE's size-based broadcast decision,
            # not a forced hint — at 100s of millions of users a forced
            # broadcast OOMs the executors (ADVICE r7 low)
            ev.where(F.col("_t") == s)
            .join(reached, "_u")
            .where(F.col("_ts") > F.col("_prev"))
            .groupBy("_u")
            .agg(F.min("_ts").alias("_prev"))
        )
        counts.append((i, s, nxt))
        reached = nxt
    spark = df.sparkSession
    out = None
    for i, s, frame in counts:
        row = frame.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).cast("long").alias("step"),
            F.lit(s).alias("event_type"),
            F.col("n_users"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def cohort_retention(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    max_offset: int | None = None,
) -> DataFrame:
    """Weekly cohort retention: users are cohorted by the epoch-week of
    their FIRST event; each (cohort, offset) cell counts the cohort's
    users active in cohort_week + offset.

    Output: (``cohort_week`` BIGINT epoch-week, ``week_offset`` BIGINT
    ≥ 0, ``n_users`` BIGINT). Offset 0 equals the cohort size by
    construction. Weeks are integer epoch-µs division (no timezone /
    calendar arithmetic — deterministic on every engine).

    Scale shape: one (user → first-event week) aggregate, one
    (user, active-week) distinct aggregate, joined on the user-sized
    side, then a (cohort, offset) count — all map-side-combinable;
    nothing event-sized ever joins anything event-sized.
    """
    # integral FLOOR division, never `/`: float division then cast could
    # flip a quotient sitting one ulp under an integer, and Spark's `div`
    # truncates toward zero while the DuckDB oracle's `//` floors — for
    # pre-1970 timestamps (negative epoch-µs) the two differ by one week,
    # so the sign is handled explicitly (house rule, trend.py; ADVICE r7)
    wk = F.expr(
        f"CASE WHEN unix_micros({ts_col}) >= 0 "
        f"THEN unix_micros({ts_col}) div {_US_PER_WEEK} "
        f"ELSE -((-unix_micros({ts_col}) + {_US_PER_WEEK} - 1) div {_US_PER_WEEK}) "
        f"END"
    )
    base = df.select(F.col(user_col).alias("_u"), wk.alias("_wk"))
    cohort = base.groupBy("_u").agg(F.min("_wk").alias("_cohort"))
    active = base.distinct()
    cells = (
        # user-sized side: AQE decides broadcast by size (ADVICE r7 low)
        active.join(cohort, "_u")
        .select("_u", "_cohort", (F.col("_wk") - F.col("_cohort")).alias("_off"))
    )
    if max_offset is not None:
        cells = cells.where(F.col("_off") <= max_offset)
    return cells.groupBy(
        F.col("_cohort").alias("cohort_week"), F.col("_off").alias("week_offset")
    ).agg(F.count(F.lit(1)).alias("n_users"))
