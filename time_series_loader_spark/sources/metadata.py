"""Filename-metadata extraction (P9) and the metadata DataFrame.

Parity targets:
- ``DefaultMetadataExtractor`` (no time info) — reference
  ``file_metadata_parser.py:54-114``
- ``TimeMetadataExtractor`` (two timestamp groups in the filename, default
  pattern ``.*?(MM-DD-YYYY HH_MM_SS) - (MM-DD-YYYY HH_MM_SS).csv``, strptime
  format ``%m-%d-%Y %H_%M_%S``) — reference ``file_metadata_parser.py:117-215``
- ``RegexMetadataExtractor`` (named groups → extra metadata, start<end
  check) — reference ``ts_extensions.py:273-349``

Design: extraction runs driver-side over the path list (tiny), producing
both ``FileMeta`` records and a small metadata DataFrame
``(source_file, file_start_time, file_end_time, meta)`` that the load path
broadcast-joins to the data on ``input_file_name()`` for lineage (P2).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from datetime import datetime
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TIME_PATTERN = (
    r".*?(\d{2}-\d{2}-\d{4}\s+\d{2}_\d{2}_\d{2})\s+-\s+(\d{2}-\d{2}-\d{4}\s+\d{2}_\d{2}_\d{2})\.csv$"
)
DEFAULT_TIME_FORMAT = "%m-%d-%Y %H_%M_%S"


@dataclass
class FileMeta:
    """Per-file metadata record (reference ``file_metadata_parser.py:13-18``)."""

    filepath: str
    start_time: Optional[datetime] = None
    end_time: Optional[datetime] = None
    additional_metadata: dict[str, Any] = field(default_factory=dict)


class MetadataExtractor:
    """Strategy: filename → FileMeta (reference ``file_metadata_parser.py:21-51``)."""

    def extract(self, filepath: str) -> FileMeta:  # pragma: no cover - interface
        raise NotImplementedError

    def is_valid_filename(self, filepath: str) -> bool:
        return True


class DefaultMetadataExtractor(MetadataExtractor):
    """No time info; carries only the path."""

    def extract(self, filepath: str) -> FileMeta:
        return FileMeta(filepath=filepath)


class TimeMetadataExtractor(MetadataExtractor):
    """Two strptime groups in the filename → start/end times."""

    def __init__(
        self,
        pattern: str = DEFAULT_TIME_PATTERN,
        time_format: str = DEFAULT_TIME_FORMAT,
    ) -> None:
        self.pattern = re.compile(pattern)
        self.time_format = time_format

    def is_valid_filename(self, filepath: str) -> bool:
        return bool(self.pattern.match(os.path.basename(filepath)))

    def extract(self, filepath: str) -> FileMeta:
        m = self.pattern.match(os.path.basename(filepath))
        if not m:
            raise ValueError(f"filename does not match time pattern: {filepath}")
        start = datetime.strptime(m.group(1), self.time_format)
        end = datetime.strptime(m.group(2), self.time_format)
        return FileMeta(filepath=filepath, start_time=start, end_time=end)


class RegexMetadataExtractor(MetadataExtractor):
    """Named regex groups; ``start``/``end`` groups become timestamps, the
    rest land in ``additional_metadata``; enforces start < end."""

    def __init__(self, pattern: str, time_format: str = DEFAULT_TIME_FORMAT) -> None:
        self.pattern = re.compile(pattern)
        self.time_format = time_format

    def is_valid_filename(self, filepath: str) -> bool:
        return bool(self.pattern.match(os.path.basename(filepath)))

    def extract(self, filepath: str) -> FileMeta:
        m = self.pattern.match(os.path.basename(filepath))
        if not m:
            raise ValueError(f"filename does not match pattern: {filepath}")
        groups = m.groupdict()
        start = end = None
        extra: dict[str, Any] = {}
        for k, v in groups.items():
            if k == "start":
                start = datetime.strptime(v, self.time_format)
            elif k == "end":
                end = datetime.strptime(v, self.time_format)
            elif v is not None:
                extra[k] = v
        if start is not None and end is not None and start >= end:
            raise ValueError(f"start_time >= end_time in filename: {filepath}")
        return FileMeta(filepath=filepath, start_time=start, end_time=end, additional_metadata=extra)


def extract_metadata(
    paths: list[str], extractor: Optional[MetadataExtractor] = None
) -> tuple[list[FileMeta], list[tuple[str, str]]]:
    """Run the extractor over all paths; (metas sorted by start_time, errors).

    Sort is TypeError-tolerant like the reference (files without time info
    keep discovery order at the end, reference ``load_file.py:1471-1479``).
    """
    extractor = extractor or DefaultMetadataExtractor()
    metas: list[FileMeta] = []
    errors: list[tuple[str, str]] = []
    for p in paths:
        try:
            metas.append(extractor.extract(p))
        except (ValueError, KeyError) as e:
            errors.append((p, str(e)))
    timed = [m for m in metas if m.start_time is not None]
    untimed = [m for m in metas if m.start_time is None]
    timed.sort(key=lambda m: m.start_time)
    return timed + untimed, errors


def metadata_dataframe(spark: SparkSession, metas: list[FileMeta]) -> DataFrame:
    """Small DF for lineage broadcast join: file → start/end/meta."""
    rows = [
        (
            "file://" + os.path.abspath(m.filepath),
            m.start_time,
            m.end_time,
            {k: str(v) for k, v in m.additional_metadata.items()},
        )
        for m in metas
    ]
    return spark.createDataFrame(
        rows,
        "source_file STRING, file_start_time TIMESTAMP, file_end_time TIMESTAMP, "
        "file_meta MAP<STRING,STRING>",
    )
