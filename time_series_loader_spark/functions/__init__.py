from time_series_loader_spark.functions.frequency import freq_to_seconds
from time_series_loader_spark.functions.timeparse import parse_timestamp_multi

__all__ = ["freq_to_seconds", "parse_timestamp_multi"]
