"""Engine configuration dataclasses.

Capability parity with the reference's four config dataclasses
(reference ``ts_config.py:9-48``), adapted to Spark reader options:

- ``FileDiscoveryConfig``  → path glob / recursive lookup / filter strategy
- ``LoadingConfig``        → ``spark.read.csv`` options (sep, encoding,
  timestampFormat) + engine-side timestamp handling
- ``ColumnNamingConfig``   → post-read column cleaning/renaming
- ``TimeSeriesConfig``     → inter-file gap/overlap validation policy
  (strategies NONE/LENIENT/STRICT/CUSTOM, reference ``ts_validator.py:11-17``)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import timedelta
from enum import Enum
from typing import Callable, Optional


class ValidationStrategy(Enum):
    """How strictly the file sequence must form a continuous series.

    Mirrors reference ``ts_validator.py:11-17``.
    """

    NONE = "none"          # accept anything
    LENIENT = "lenient"    # gaps OK, overlaps invalid
    STRICT = "strict"      # any gap-over-threshold or overlap invalid
    CUSTOM = "custom"      # user-supplied validator decides


@dataclass
class FileDiscoveryConfig:
    """File discovery options (reference ``ts_config.py:9-16``)."""

    file_pattern: str = "*.csv"
    recursive: bool = False
    # Optional extra predicate applied to each candidate path (driver-side).
    path_filter: Optional[Callable[[str], bool]] = None
    require_nonempty: bool = True


@dataclass
class LoadingConfig:
    """CSV load options (reference ``ts_config.py:19-30``).

    ``time_format`` uses Java/Spark datetime patterns, NOT strptime; the
    strptime default ``%d/%m/%Y %H:%M`` of the reference maps to
    ``dd/MM/yyyy HH:mm``.
    """

    # Source format: csv (reference parity) | parquet | json — the latter
    # two come free with Spark's readers and share the whole pipeline.
    format: str = "csv"
    delimiter: str = ";"
    decimal: str = "."
    encoding: str = "utf-8"
    header: bool = True
    timestamp_column: Optional[str] = None
    time_format: str = "dd/MM/yyyy HH:mm"
    # Additional candidate formats tried via coalesce() when strict parsing
    # fails (replaces the reference's row-wise dateparser fallback,
    # reference load_file.py:1932-1955 — flagged slow there).
    fallback_time_formats: tuple[str, ...] = (
        "yyyy-MM-dd HH:mm:ss",
        "yyyy-MM-dd'T'HH:mm:ss",
        "MM/dd/yyyy HH:mm",
        "yyyy-MM-dd",
    )
    # Coerce all non-timestamp columns to double with null-on-failure
    # (reference ts_extensions.py:41-44 pd.to_numeric(errors="coerce")).
    coerce_numeric: bool = True
    add_lineage: bool = True


@dataclass
class ColumnNamingConfig:
    """Column-name cleanup (reference ``ts_config.py:33-38``)."""

    strip_whitespace: bool = True
    # "A - B - C" -> "C" (rsplit on last " - ", reference load_file.py:1657-1666)
    clean_names: bool = False
    rename_map: dict[str, str] = field(default_factory=dict)


@dataclass
class TimeSeriesConfig:
    """Inter-file continuity policy (reference ``ts_config.py:41-48``)."""

    strategy: ValidationStrategy = ValidationStrategy.LENIENT
    max_allowed_gap: timedelta = timedelta(minutes=15)
    allow_overlap: bool = False
    max_allowed_overlap: timedelta = timedelta(0)
    fail_on_validation_error: bool = False
    # CUSTOM strategy: callable(list[FileMeta]) -> (bool, list[str])
    validator: Optional[Callable] = None
