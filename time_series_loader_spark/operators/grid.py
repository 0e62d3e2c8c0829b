"""Regular time grids and grid reindexing (J2).

Parity targets:
- grid construction — reference ``load_file.py:2303-2329`` (``date_range``
  over the full span, or a union of per-segment ranges that skip large gaps)
- reindex — reference ``load_file.py:2331-2333`` (``df.reindex(grid)``,
  nulls at missing points)

Spark-first notes: the grid is ``sequence(min, max, interval)`` + ``explode``
— generated distributed, never collected. The reindex is a left join grid ←
data on the timestamp; the grid side is usually small relative to the data
(span/step rows) so Catalyst broadcast-joins it when under the threshold;
for dense grids AQE picks a shuffle join with both sides partitioned on ts.
"""

from __future__ import annotations

from datetime import datetime
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from time_series_loader_spark.functions.frequency import freq_to_seconds


def time_grid(
    spark: SparkSession,
    start: datetime | str,
    end: datetime | str,
    freq: str | int,
    ts_col: str = "ts",
) -> DataFrame:
    """Regular [start, end] inclusive grid at ``freq`` as one DataFrame."""
    step = freq_to_seconds(freq)
    df = spark.createDataFrame([(str(start), str(end))], "lo STRING, hi STRING")
    return df.select(
        F.explode(
            F.sequence(
                F.to_timestamp("lo"),
                F.to_timestamp("hi"),
                F.expr(f"INTERVAL {step} SECOND"),
            )
        ).alias(ts_col)
    )


def grid_over_span(
    df: DataFrame,
    ts_col: str,
    freq: str | int,
    segments: Sequence[tuple[datetime, datetime]] | None = None,
) -> DataFrame:
    """Grid covering the data's own [min, max] span (or explicit segments).

    ``segments`` mirrors the reference's gap-skipping grids
    (``load_file.py:2309-2329``): one sequence per continuous segment,
    unioned. Segment list is tiny (one per large gap) — parallelized as a
    literal-backed DataFrame, grid rows still generated on executors.
    """
    step = freq_to_seconds(freq)
    interval = F.expr(f"INTERVAL {step} SECOND")
    if segments is not None:
        spark = df.sparkSession
        seg_df = spark.createDataFrame(
            [(lo, hi) for lo, hi in segments], "lo TIMESTAMP, hi TIMESTAMP"
        )
        return seg_df.select(
            F.explode(F.sequence("lo", "hi", interval)).alias(ts_col)
        ).distinct()
    bounds = df.agg(F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi"))
    return bounds.select(F.explode(F.sequence("lo", "hi", interval)).alias(ts_col))


def reindex_to_grid(
    df: DataFrame,
    ts_col: str,
    freq: str | int,
    segments: Sequence[tuple[datetime, datetime]] | None = None,
    align_to_step: bool = True,
) -> DataFrame:
    """J2: left-align data onto a regular grid; missing points become null.

    ``align_to_step=True`` floors the span bounds to the step so grid points
    are step-aligned (deterministic regardless of the first row's subsecond
    offset). Exact-timestamp matches join; everything else is null — same as
    ``df.reindex(full_range)``.
    """
    step = freq_to_seconds(freq)
    if segments is None and align_to_step:
        bounds = df.agg(
            F.timestamp_seconds(F.floor(F.min(ts_col).cast("double") / step) * step).alias("lo"),
            F.timestamp_seconds(F.floor(F.max(ts_col).cast("double") / step) * step).alias("hi"),
        )
        grid = bounds.select(
            F.explode(
                F.sequence("lo", "hi", F.expr(f"INTERVAL {step} SECOND"))
            ).alias(ts_col)
        )
    else:
        grid = grid_over_span(df, ts_col, freq, segments)
    # no trailing orderBy: downstream fills re-sort in their windows anyway
    return grid.join(df, on=ts_col, how="left")
