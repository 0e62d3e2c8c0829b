from time_series_loader_spark.sources.discovery import discover_files, DiscoveryStats
from time_series_loader_spark.sources.metadata import (
    FileMeta,
    MetadataExtractor,
    DefaultMetadataExtractor,
    TimeMetadataExtractor,
    RegexMetadataExtractor,
)
from time_series_loader_spark.sources.validation import (
    SequenceIssue,
    validate_file_sequence,
    is_valid_sequence,
    coverage_report,
)
from time_series_loader_spark.sources.csv import load_csv_timeseries

__all__ = [
    "discover_files",
    "DiscoveryStats",
    "FileMeta",
    "MetadataExtractor",
    "DefaultMetadataExtractor",
    "TimeMetadataExtractor",
    "RegexMetadataExtractor",
    "SequenceIssue",
    "validate_file_sequence",
    "is_valid_sequence",
    "coverage_report",
    "load_csv_timeseries",
]
