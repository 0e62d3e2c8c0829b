"""Row-level continuity analytics: diffs, frequency inference, gaps, stats.

Parity targets (reference ``load_file.py:2024-2125``):
- W1 row-to-row diff (``df[ts].diff()``, ``load_file.py:2080``)
- W2 gap enumeration (``load_file.py:2079-2092``; TimeSeriesGap dataclass
  ``ts_validator.py:40-47``)
- W3 frequency inference (``pd.infer_freq`` fallback median-diff,
  ``load_file.py:2063-2074``)
- A3 continuity statistics (``load_file.py:2094-2111``)

Spark-first notes: one ``Window.orderBy(ts)`` pass computes the lag/diff.
An unkeyed window is a single-partition sort — correct for the reference's
one-global-timeline model but a bottleneck at 100 TB, so every function
takes ``group_cols`` (series key) to partition the window; with a key the
plan is a standard hash-partitioned window, no global funnel
(SURVEY.md §7 hard-part (d)).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from time_series_loader_spark.functions.frequency import freq_to_seconds


def _freq_float(freq: str | int | float) -> float:
    """Seconds as float — numeric inputs pass through unrounded (median-
    inferred frequencies are fractional)."""
    if isinstance(freq, (int, float)):
        if freq <= 0:
            raise ValueError(f"frequency must be positive, got {freq!r}")
        return float(freq)
    return float(freq_to_seconds(freq))


def _w(group_cols: Sequence[str], ts_col: str) -> Window:
    w = Window.orderBy(ts_col)
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy(ts_col)
    return w


def with_time_diff(
    df: DataFrame,
    ts_col: str,
    group_cols: Sequence[str] = (),
    diff_col: str = "diff_seconds",
) -> DataFrame:
    """W1: per-row delta to the previous row, in (fractional) seconds."""
    w = _w(group_cols, ts_col)
    prev = F.lag(ts_col).over(w)
    # Subsecond-exact: cast both to double epoch before differencing.
    delta = F.col(ts_col).cast("double") - prev.cast("double")
    return df.withColumn(diff_col, delta)


def infer_frequency_seconds(
    df: DataFrame, ts_col: str, group_cols: Sequence[str] = ()
) -> DataFrame:
    """W3: median inter-row delta in seconds, as a 1-row (or per-group) DF.

    The reference falls back to the median of ``np.diff`` when
    ``pd.infer_freq`` fails (``load_file.py:2063-2074``); real-world spacing
    is rarely perfectly regular so the median IS the inference. Exact
    ``percentile`` (not approx) — the diff column is one double per row.
    """
    diffs = with_time_diff(df, ts_col, group_cols).where(F.col("diff_seconds").isNotNull())
    agg = F.percentile(F.col("diff_seconds"), F.lit(0.5)).alias("freq_seconds")
    if group_cols:
        return diffs.groupBy(*group_cols).agg(agg)
    return diffs.agg(agg)


def find_gaps(
    df: DataFrame,
    ts_col: str,
    expected_freq: str | int | float,
    min_gap: str | int | float = 0,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """W2: rows where delta > expected + min_gap → gap records.

    Output columns: ``gap_start``, ``gap_end``, ``gap_seconds``,
    ``expected_points`` (= floor(delta/expected) - 1, reference
    ``load_file.py:2088-2091``), plus ``group_cols``.
    """
    expected_s = _freq_float(expected_freq)
    min_gap_s = _freq_float(min_gap) if min_gap else 0.0
    w = _w(group_cols, ts_col)
    prev_ts = F.lag(ts_col).over(w)
    delta = F.col(ts_col).cast("double") - prev_ts.cast("double")
    return (
        df.select(*group_cols, F.col(ts_col), prev_ts.alias("_prev"), delta.alias("_d"))
        .where(F.col("_d") > expected_s + min_gap_s)
        .select(
            *group_cols,
            F.col("_prev").alias("gap_start"),
            F.col(ts_col).alias("gap_end"),
            F.col("_d").alias("gap_seconds"),
            (F.floor(F.col("_d") / expected_s) - 1).cast("bigint").alias("expected_points"),
        )
    )


def continuity_stats(
    df: DataFrame,
    ts_col: str,
    expected_freq: str | int | float,
    min_gap: str | int | float = 0,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """A3: min/max/count, total duration, summed gap time, coverage %.

    Coverage = 1 - (gap seconds / total span), as in reference
    ``load_file.py:2102-2111``. Computed as two small aggregations (base +
    gaps) joined driver-free; stays a DataFrame so it runs per-group.
    """
    base = df.groupBy(*group_cols).agg(
        F.min(ts_col).alias("start_time"),
        F.max(ts_col).alias("end_time"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    gaps = (
        find_gaps(df, ts_col, expected_freq, min_gap, group_cols)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("gap_seconds").alias("gap_seconds_total"),
        )
    )
    joined = base.join(gaps, list(group_cols), "left") if group_cols else base.crossJoin(gaps)
    span = F.col("end_time").cast("double") - F.col("start_time").cast("double")
    gap_s = F.coalesce(F.col("gap_seconds_total"), F.lit(0.0))
    return joined.select(
        *group_cols,
        "start_time",
        "end_time",
        "n_rows",
        F.coalesce(F.col("n_gaps"), F.lit(0)).cast("bigint").alias("n_gaps"),
        gap_s.alias("gap_seconds_total"),
        span.alias("span_seconds"),
        F.when(span > 0, (F.lit(1.0) - gap_s / span) * 100.0)
        .otherwise(F.lit(100.0))
        .alias("coverage_pct"),
    )
