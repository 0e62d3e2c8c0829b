from time_series_loader_spark.operators.resample import resample, resample_with_dates
from time_series_loader_spark.operators.continuity import (
    infer_frequency_seconds,
    find_gaps,
    continuity_stats,
)
from time_series_loader_spark.operators.grid import time_grid, reindex_to_grid
from time_series_loader_spark.operators.fill import ffill, bfill
from time_series_loader_spark.operators.interpolate import interpolate_time
from time_series_loader_spark.operators.asof import asof_nearest
from time_series_loader_spark.operators.outliers import remove_outliers_zscore

__all__ = [
    "resample",
    "resample_with_dates",
    "infer_frequency_seconds",
    "find_gaps",
    "continuity_stats",
    "time_grid",
    "reindex_to_grid",
    "ffill",
    "bfill",
    "interpolate_time",
    "asof_nearest",
    "remove_outliers_zscore",
]
