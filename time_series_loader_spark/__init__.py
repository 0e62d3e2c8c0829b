"""time_series_loader_spark — a PySpark-native time-series/analytics engine.

From-scratch reimplementation of the capabilities of the reference library
``bryzgalovdm/time-series-loader`` (a pandas, single-process CSV time-series
loader — see SURVEY.md), re-expressed as lazy, distributed Spark DataFrame
plans, plus the large-scale data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) a 100 TB training-data pipeline
needs.

Design stance: capability parity, not architecture parity. The reference's
eager staged pandas pipeline (reference ``load_file.py:1263-1323``) becomes a
single declarative DataFrame plan that Catalyst optimizes; filename metadata
is a first-class DataFrame joined via ``input_file_name()``; validation is
driver-side planning over a path list before any executor work.
"""

from time_series_loader_spark.session import get_spark
from time_series_loader_spark.config import (
    ColumnNamingConfig,
    FileDiscoveryConfig,
    LoadingConfig,
    TimeSeriesConfig,
    ValidationStrategy,
)
from time_series_loader_spark.plans.loader import TimeSeriesLoader

__all__ = [
    "get_spark",
    "TimeSeriesLoader",
    "FileDiscoveryConfig",
    "LoadingConfig",
    "ColumnNamingConfig",
    "TimeSeriesConfig",
    "ValidationStrategy",
]

__version__ = "0.1.0"
