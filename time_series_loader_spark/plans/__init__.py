from time_series_loader_spark.plans.loader import TimeSeriesLoader
from time_series_loader_spark.plans.hooks import (
    DataTransformer,
    PostProcessingHook,
    OutlierRemovalHook,
)

__all__ = ["TimeSeriesLoader", "DataTransformer", "PostProcessingHook", "OutlierRemovalHook"]
