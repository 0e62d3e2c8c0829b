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

Scale shape: one group-sized min-timestamp aggregate broadcast back
(the per-series epoch offset keeps x² small enough for exact decimals),
then ONE moments groupBy with map-side combine — the same two-exchange
cost as any keyed aggregate; nothing event-sized joins anything
event-sized. Series with < 2 distinct timestamps yield NULL (zero
variance in x).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
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
    t0 = base.groupBy(*g).agg(F.min("_us").alias("_t0"))
    pts = base.join(F.broadcast(t0), g).select(
        *g,
        F.expr("(_us - _t0) div 1000000").alias("_x"),  # whole seconds
        "_vu",
    )
    d38 = "decimal(38,0)"
    mom = pts.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_x").cast(d38)).alias("_sx"),
        F.sum(F.col("_vu").cast(d38)).alias("_sv"),
        F.sum((F.col("_x") * F.col("_vu")).cast(d38)).alias("_sxv"),
        F.sum((F.col("_x") * F.col("_x")).cast(d38)).alias("_sxx"),
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
