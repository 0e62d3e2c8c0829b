"""Per-series linear trend: exact-moment OLS slope.

The time-series question after "are there gaps" is "which way is it
drifting" — per-series least-squares slope over (time, value). The
moments (n, Σx, Σv, Σxv, Σx²) are EXACT integers here: x is whole
seconds from the series' own start (integral epoch-µs arithmetic), v is
micro-unit-quantized (``floor(v·1e6+0.5)``, the house float rule), and
the slope closed form

    slope = (n·Σxv − Σx·Σv) / (n·Σx² − (Σx)²)

is evaluated as one sign-explicit integral division of DECIMAL(38,0)
products — bit-identical on every engine, partitioning, and platform
(DuckDB mirrors it with HUGEINT ``//`` on the same absolute values; the
sign is applied outside the division because Spark's ``div`` truncates
toward zero while ``//`` floors, and the two disagree on negatives).

Scale shape: the per-series epoch offset (which keeps x² small enough
for exact decimals) is an unbounded window MIN over the group key, so
the whole fit is ONE exchange — the moments groupBy reuses the window's
partitioning. Nothing event-sized joins anything event-sized, and there
is no broadcast decision to mis-size at any group cardinality (the r8
groupBy+join-back form went super-linear at 100× groups; SCALING.md r9
table). Series with < 2 distinct timestamps yield NULL (zero variance
in x).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def trend_slope(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_cols: Sequence[str],
) -> DataFrame:
    """OLS slope per group. Output: ``group_cols`` + ``n`` (BIGINT
    points used) + ``slope_nano`` (BIGINT, value-units per second
    × 1e9, truncated toward zero; NULL when x has no variance).

    Null / non-finite / |v| ≥ 1e12 readings are excluded from the fit
    (the try_cast-to-DECIMAL rule all quantized operators share), and
    ``n`` counts only the fitted points.
    """
    g = list(group_cols)
    # micro-unit quantization via DECIMAL: non-finite / overflow → null
    vu = (
        F.col(value_col).try_cast("decimal(18,6)") * F.lit(1_000_000)
    ).cast("long")
    base = df.select(
        *g,
        F.unix_micros(F.col(ts_col)).alias("_us"),
        vu.alias("_vu"),
    ).where(F.col("_vu").isNotNull() & F.col("_us").isNotNull())
    # per-group epoch offset as an unbounded window aggregate: ONE
    # exchange by the group key, and the moments groupBy below reuses
    # that partitioning (zero further exchanges). The r8 form computed
    # t0 with a groupBy + join back; at 100× groups the join leg turned
    # the probe's slope super-linear (9× at 100× rows) while this form
    # measured flat 1.0 s from 1× to 100× (SCALING.md r9 table) — the
    # window needs no broadcast decision at all, so there is nothing to
    # mis-size at 100s-of-millions of groups either
    w_g = Window.partitionBy(*g)
    pts = base.withColumn("_t0", F.min("_us").over(w_g)).select(
        *g,
        F.expr("(_us - _t0) div 1000000").alias("_x"),  # whole seconds
        "_vu",
    )
    d38 = "decimal(38,0)"
    # operands cast to DECIMAL(38,0) BEFORE multiplying, mirroring the
    # oracle's CAST(x AS HUGEINT) * vu — a BIGINT product of x·vu wraps
    # silently (ANSI off) for |v|~3e5 over a year-long series even though
    # each factor is inside the documented envelope (ADVICE r7 high)
    mom = pts.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_x").cast(d38)).alias("_sx"),
        F.sum(F.col("_vu").cast(d38)).alias("_sv"),
        F.sum(F.col("_x").cast(d38) * F.col("_vu").cast(d38)).alias("_sxv"),
        F.sum(F.col("_x").cast(d38) * F.col("_x").cast(d38)).alias("_sxx"),
    )
    num = F.col("n").cast(d38) * F.col("_sxv") - F.col("_sx") * F.col("_sv")
    den = F.col("n").cast(d38) * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    # sign-explicit truncation: |num|·1000 div den, sign reapplied —
    # identical on engines whose integral division rounds differently
    mag = F.expr("CAST((abs(_num) * 1000) div _den AS BIGINT)")
    slope = F.when(
        F.col("_den") > 0,
        F.when(F.col("_num") < 0, -mag).otherwise(mag),
    ).cast("long")
    return (
        mom.withColumn("_num", num)
        .withColumn("_den", den)
        .select(*g, "n", slope.alias("slope_nano"))
    )


def cusum_stats(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_cols: Sequence[str],
    threshold: float,
    order_cols: Sequence[str] = (),
    target: float | None = None,
) -> DataFrame:
    """Per-series CUSUM drift detection (Page 1954) against the
    series' own mean, summarized per series.

    The textbook recursions ``S⁺_i = max(0, S⁺_{i-1} + d_i)`` /
    ``S⁻_i = max(0, S⁻_{i-1} − d_i)`` look inherently sequential, but
    both have window-expressible closed forms:

        S⁺_i = P_i − min_{j≤i} P_j      S⁻_i = max_{j≤i} P_j − P_i

    with ``P`` the running prefix sum of deviations — so the whole
    detector is ONE key-partitioned sort plus three running window
    aggregates, the same single-exchange cost as any keyed window.

    INTEGER-PURE: values quantize to µunits (DECIMAL try_cast — the
    shared unusable-reading rule); deviations from the series' own
    mean are kept exact by scaling with n (``d_i = n·vu_i − Σvu``, an
    integer), so thresholds compare as ``S > n·threshold_u`` and the
    emitted magnitudes divide back by n with integral division (S ≥ 0,
    so trunc ≡ floor on both engines).

    Output per series: ``group_cols`` + ``n`` + ``n_flags_pos`` /
    ``n_flags_neg`` (samples where the scaled CUSUM exceeds the scaled
    threshold) + ``max_cusum_pos_u`` / ``max_cusum_neg_u`` (peak
    excursions, µunits, integral-div by n).

    ``order_cols``: extra tie-breakers after ``ts_col`` — REQUIRED for
    determinism when a series can repeat timestamps (the running sums
    are order-dependent within ties).

    ``target``: a FIXED reference level instead of the series' own mean
    — the single-pass online form (no totals join, no n-scaling:
    ``d_i = vu_i − target_u`` directly, outputs in plain µunits). This
    is the mode the streaming dual (``streaming/stateful.py::
    streaming_cusum``) mirrors exactly, since a self-mean needs the
    whole series before the first row can score.
    """
    g = list(group_cols)
    vu = (
        F.col(value_col).try_cast("decimal(18,6)") * F.lit(1_000_000)
    ).cast("long")
    base = df.select(
        *g, F.col(ts_col).alias("_ts"), *order_cols, vu.alias("_vu")
    ).where(F.col("_vu").isNotNull())
    d38 = "decimal(38,0)"
    order = [F.col("_ts")] + [F.col(c) for c in order_cols]
    w = Window.partitionBy(*g).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    if target is not None:
        t_u = int(round(target * 1_000_000))
        scored = base.withColumn(
            "_d", (F.col("_vu") - F.lit(t_u)).cast(d38)
        ).withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy(*g)))
    else:
        # per-group totals as unbounded window aggregates over the SAME
        # partitioning the ordered scan below already pays for: the sort
        # by (g, ts) satisfies the unordered spec's requirement, so
        # Catalyst plans one exchange + one sort for totals AND prefix
        # scan together. The r8 form used a groupBy + join back, which
        # re-scanned and re-exchanged the event-sized side (super-linear
        # in the 100× probe, SCALING.md r9 table)
        w_g = Window.partitionBy(*g)
        scored = (
            base.withColumn("_n", F.count(F.lit(1)).over(w_g))
            .withColumn("_sv", F.sum("_vu").over(w_g))
            .withColumn(
                "_d",
                F.col("_n").cast(d38) * F.col("_vu").cast(d38)
                - F.col("_sv").cast(d38),
            )
        )
    scored = (
        scored
        .withColumn("_p", F.sum("_d").over(w))
        # the running extrema must include the VIRTUAL empty prefix
        # P_0 = 0 (the recursion starts at S_0 = 0): without it, a
        # series whose prefix never crosses zero under-counts one side
        .withColumn(
            "_sp",
            F.col("_p") - F.least(F.lit(0).cast(d38), F.min("_p").over(w)),
        )
        .withColumn(
            "_sn",
            F.greatest(F.lit(0).cast(d38), F.max("_p").over(w)) - F.col("_p"),
        )
    )
    thr_u = int(round(threshold * 1_000_000))
    # deviations (and hence S) are n-scaled in self-mean mode, unscaled
    # in fixed-target mode — thresholds and emitted peaks follow suit
    scale = F.lit(1).cast(d38) if target is not None else F.col("_n").cast(d38)
    scored = scored.withColumn("_scale", scale)
    lim = F.col("_scale") * F.lit(thr_u).cast(d38)
    return scored.groupBy(*g).agg(
        F.first("_n").cast("long").alias("n"),
        F.sum(F.when(F.col("_sp") > lim, 1).otherwise(0))
        .cast("long")
        .alias("n_flags_pos"),
        F.sum(F.when(F.col("_sn") > lim, 1).otherwise(0))
        .cast("long")
        .alias("n_flags_neg"),
        F.expr(
            "CAST(max(_sp) div first(_scale) AS BIGINT)"
        ).alias("max_cusum_pos_u"),
        F.expr(
            "CAST(max(_sn) div first(_scale) AS BIGINT)"
        ).alias("max_cusum_neg_u"),
    )


def trend_cusum_stats(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_cols: Sequence[str],
    threshold: float,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """:func:`trend_slope` and self-mean :func:`cusum_stats` fused into
    ONE keyed pass — the form the ``series_models`` composite runs.

    Both operators consume the same (group, ts, value) stream; run
    separately they each pay their own scan + exchange. Fused, the plan
    is: one exchange by the group key, one unordered window (totals
    n/Σv + the trend epoch offset t0), one (ts, tie-break)-ordered
    window (the CUSUM prefix sum + running extrema), and one final
    groupBy that reuses the partitioning — the 100× probe measured the
    pair dropping from 9.0 s + 4.5 s (join-based, r8) to 1.0 s flat
    (SCALING.md r9 table).

    Column semantics are bit-identical to the standalones (pinned by
    ``tests/test_trend.py::test_fused_equals_standalones``), including
    their DIFFERENT null filters: CUSUM scores every quantizable
    reading (``_vu`` non-null); the trend fit additionally requires a
    timestamp, so its moments are when-guarded on ``_us`` and reported
    under a separate ``n_trend``. A group whose readings all lack
    timestamps gets ``n_trend = 0`` and a NULL slope (such a group is
    absent from standalone ``trend_slope`` output entirely — callers
    splitting sections filter ``n_trend > 0`` for exact parity).

    Output: ``group_cols`` + CUSUM columns (``n``, ``n_flags_pos``,
    ``n_flags_neg``, ``max_cusum_pos_u``, ``max_cusum_neg_u``) + trend
    columns (``n_trend``, ``slope_nano``).
    """
    g = list(group_cols)
    vu = (
        F.col(value_col).try_cast("decimal(18,6)") * F.lit(1_000_000)
    ).cast("long")
    base = df.select(
        *g,
        F.col(ts_col).alias("_ts"),
        *order_cols,
        F.unix_micros(F.col(ts_col)).alias("_us"),
        vu.alias("_vu"),
    ).where(F.col("_vu").isNotNull())
    d38 = "decimal(38,0)"
    w_g = Window.partitionBy(*g)
    order = [F.col("_ts")] + [F.col(c) for c in order_cols]
    w_o = Window.partitionBy(*g).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    has_ts = F.col("_us").isNotNull()
    scored = (
        base.withColumn("_n", F.count(F.lit(1)).over(w_g))
        .withColumn("_sv", F.sum("_vu").over(w_g))
        .withColumn("_t0", F.min("_us").over(w_g))
        .withColumn(
            "_d",
            F.col("_n").cast(d38) * F.col("_vu").cast(d38)
            - F.col("_sv").cast(d38),
        )
        .withColumn("_p", F.sum("_d").over(w_o))
        .withColumn(
            "_sp",
            F.col("_p") - F.least(F.lit(0).cast(d38), F.min("_p").over(w_o)),
        )
        .withColumn(
            "_sn",
            F.greatest(F.lit(0).cast(d38), F.max("_p").over(w_o)) - F.col("_p"),
        )
        # trend x: whole seconds from the group's own start; NULL (and
        # excluded from every moment) when the reading has no timestamp
        .withColumn(
            "_x", F.when(has_ts, F.expr("(_us - _t0) div 1000000"))
        )
    )
    thr_u = int(round(threshold * 1_000_000))
    lim = F.col("_n").cast(d38) * F.lit(thr_u).cast(d38)
    mom = scored.groupBy(*g).agg(
        F.first("_n").cast("long").alias("n"),
        F.sum(F.when(F.col("_sp") > lim, 1).otherwise(0))
        .cast("long")
        .alias("n_flags_pos"),
        F.sum(F.when(F.col("_sn") > lim, 1).otherwise(0))
        .cast("long")
        .alias("n_flags_neg"),
        F.expr(
            "CAST(max(_sp) div first(CAST(_n AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("max_cusum_pos_u"),
        F.expr(
            "CAST(max(_sn) div first(CAST(_n AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("max_cusum_neg_u"),
        # trend moments, when-guarded to the timestamped subset (sum
        # skips NULL _x terms; count counts them explicitly)
        F.sum(F.when(F.col("_x").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_trend"),
        F.sum(F.col("_x").cast(d38)).alias("_sx"),
        F.sum(F.when(F.col("_x").isNotNull(), F.col("_vu")).cast(d38)).alias(
            "_svt"
        ),
        F.sum(F.col("_x").cast(d38) * F.col("_vu").cast(d38)).alias("_sxv"),
        F.sum(F.col("_x").cast(d38) * F.col("_x").cast(d38)).alias("_sxx"),
    )
    num = (
        F.col("n_trend").cast(d38) * F.col("_sxv")
        - F.col("_sx") * F.col("_svt")
    )
    den = (
        F.col("n_trend").cast(d38) * F.col("_sxx")
        - F.col("_sx") * F.col("_sx")
    )
    mag = F.expr("CAST((abs(_num) * 1000) div _den AS BIGINT)")
    slope = F.when(
        F.col("_den") > 0,
        F.when(F.col("_num") < 0, -mag).otherwise(mag),
    ).cast("long")
    return (
        mom.withColumn("_num", num)
        .withColumn("_den", den)
        .select(
            *g,
            "n",
            "n_flags_pos",
            "n_flags_neg",
            "max_cusum_pos_u",
            "max_cusum_neg_u",
            "n_trend",
            slope.alias("slope_nano"),
        )
    )
