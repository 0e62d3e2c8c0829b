"""Sessionization: split a keyed event stream on inactivity gaps.

The guide's canonical OLAP pattern: lag + cumulative-sum windows, keyed by
the entity (hash-partitioned — the 100 TB shape; events of one key must be
window-sorted together, which is unavoidable for session semantics).
Streaming variant: ``F.session_window`` in streaming/ingest-style plans.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from time_series_loader_spark.functions.frequency import freq_to_seconds


def sessionize(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    gap: str | int = "30min",
) -> DataFrame:
    """Assign ``session_id`` (1-based per key) splitting on gaps > ``gap``;
    returns one row per session with bounds and event count."""
    gap_s = freq_to_seconds(gap)
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    delta = F.col(ts_col).cast("double") - F.lag(ts_col).over(w).cast("double")
    new_sess = F.when(delta.isNull() | (delta > gap_s), 1).otherwise(0)
    sess_id = F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        df.withColumn("session_id", sess_id)
        .groupBy(*key_cols, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
