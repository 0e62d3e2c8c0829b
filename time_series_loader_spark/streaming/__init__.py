from time_series_loader_spark.streaming.ingest import (
    file_as_stream_dir,
    run_available_now,
    stream_csv_directory,
    stream_parquet,
    windowed_resample_stream,
)
from time_series_loader_spark.streaming.incremental import incremental_dedup_stream
from time_series_loader_spark.streaming.stateful import (
    streaming_counter_rate,
    streaming_cusum,
    streaming_funnel,
    streaming_ewm_mean,
    streaming_trend_slope,
    streaming_gap_detector,
)

__all__ = [
    "file_as_stream_dir",
    "run_available_now",
    "stream_csv_directory",
    "stream_parquet",
    "windowed_resample_stream",
    "streaming_gap_detector",
    "streaming_counter_rate",
    "streaming_cusum",
    "streaming_funnel",
    "streaming_ewm_mean",
    "streaming_trend_slope",
    "incremental_dedup_stream",
]
