"""Rolling-window statistics (beyond-reference time-series surface).

Row-count windows (pandas ``rolling(n)``) and time-range windows
(``rolling('1h')``) over a series key. Row windows use
``rowsBetween``; time windows use ``rangeBetween`` on epoch seconds —
both JVM-side, hash-partitioned by the series key (the 100 TB shape; the
unkeyed form inherits the same single-partition caveat as any global
ordering and is intended for composed, already-reduced frames).

Means accumulate in DECIMAL like every float aggregate in this engine —
rolling results are reproducible across partitionings.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from time_series_loader_spark.functions.frequency import freq_to_seconds

_DEC = "decimal(27,6)"


def rolling_stats(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    window: int | str,
    group_cols: Sequence[str] = (),
    min_periods: int = 1,
) -> DataFrame:
    """Add rolling mean/min/max/count of ``value_col``.

    ``window``: int n → last n ROWS (current inclusive, pandas
    ``rolling(n)``); str like "1h" → TIME range (current inclusive,
    pandas ``rolling('1h')`` on a datetime index).
    """
    if isinstance(window, int):
        base = (
            Window.partitionBy(*group_cols).orderBy(ts_col)
            if group_cols
            else Window.orderBy(ts_col)
        ).rowsBetween(-(window - 1), 0)
    else:
        secs = freq_to_seconds(window)
        order = F.col(ts_col).cast("double")
        base = (
            Window.partitionBy(*group_cols).orderBy(order)
            if group_cols
            else Window.orderBy(order)
        ).rangeBetween(-(secs), 0)

    c = F.col(value_col)
    cnt = F.count(c).over(base)
    mean = F.sum(c.cast(_DEC)).over(base).cast("double") / cnt
    out = df.select(
        "*",
        F.when(cnt >= min_periods, mean).alias(f"{value_col}_roll_mean"),
        F.when(cnt >= min_periods, F.min(c).over(base)).alias(f"{value_col}_roll_min"),
        F.when(cnt >= min_periods, F.max(c).over(base)).alias(f"{value_col}_roll_max"),
        cnt.alias(f"{value_col}_roll_n"),
    )
    return out
