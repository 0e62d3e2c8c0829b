"""File discovery and validity filtering (S1, S2, S6, S7).

Parity targets:
- S1 directory glob scan — reference ``load_file.py:1104-1197``
- S2 direct file-list validation — reference ``load_file.py:842-887``
- S6 file-validity filter (extension, readable, non-empty) — reference
  ``DefaultFileFilter``, ``file_metadata_parser.py:235-270``
- S7 filename-pattern filter — reference ``MetadataFileFilter``,
  ``file_metadata_parser.py:273-296``

Design: discovery is DRIVER-SIDE planning over a path list (cheap; file
counts are ~thousands even at 100 TB since each file is a big slice), then
ONE ``spark.read`` over the validated paths — Spark's InMemoryFileIndex and
FileSourceScanExec parallelize the actual IO. We deliberately do not read
file contents here; content checks are a separate limited read (S8).
"""

from __future__ import annotations

import glob as _glob
import os
import re
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence


@dataclass
class DiscoveryStats:
    """Discovery summary (reference discovery stats, ``load_file.py:1215-1261``)."""

    total_candidates: int = 0
    valid: int = 0
    invalid: int = 0
    invalid_reasons: dict[str, str] = field(default_factory=dict)


def _is_valid_file(
    path: str,
    extension: Optional[str],
    require_nonempty: bool,
) -> Optional[str]:
    """Return a rejection reason, or None if the file is valid (S6)."""
    if not os.path.isfile(path):
        return "not_a_file"
    if extension and not path.lower().endswith(extension.lower()):
        return "wrong_extension"
    if not os.access(path, os.R_OK):
        return "not_readable"
    if require_nonempty and os.path.getsize(path) == 0:
        return "empty_file"
    return None


def discover_files(
    base_path: Optional[str] = None,
    files: Optional[Sequence[str]] = None,
    pattern: str = "*.csv",
    recursive: bool = False,
    extension: Optional[str] = ".csv",
    require_nonempty: bool = True,
    filename_regex: Optional[str] = None,
    path_filter: Optional[Callable[[str], bool]] = None,
) -> tuple[list[str], DiscoveryStats]:
    """Enumerate + validate candidate files; sorted valid list + stats.

    Exactly one of ``base_path`` / ``files`` must be given (source
    exclusivity, reference ``load_file.py:93-101``). Raises FileNotFoundError
    when a glob matches nothing (reference errors on empty discovery,
    ``load_file.py:1151-1160``).
    """
    if (base_path is None) == (files is None):
        raise ValueError("provide exactly one of base_path or files")
    if base_path is not None:
        if not os.path.isdir(base_path):
            raise FileNotFoundError(f"base path is not a directory: {base_path}")
        glob_pat = os.path.join(base_path, "**", pattern) if recursive else os.path.join(
            base_path, pattern
        )
        candidates = sorted(_glob.glob(glob_pat, recursive=recursive))
        if not candidates:
            raise FileNotFoundError(f"no files matching {pattern!r} under {base_path}")
    else:
        candidates = sorted(str(f) for f in files)  # S2: sorted output
        missing = [f for f in candidates if not os.path.exists(f)]
        if missing:
            raise FileNotFoundError(f"files do not exist: {missing}")

    stats = DiscoveryStats(total_candidates=len(candidates))
    rx = re.compile(filename_regex) if filename_regex else None
    valid: list[str] = []
    for p in candidates:
        reason = _is_valid_file(p, extension, require_nonempty)
        if reason is None and rx and not rx.match(os.path.basename(p)):
            reason = "filename_pattern_mismatch"  # S7
        if reason is None and path_filter and not path_filter(p):
            reason = "custom_filter_rejected"
        if reason is None:
            valid.append(p)
            stats.valid += 1
        else:
            stats.invalid += 1
            stats.invalid_reasons[p] = reason
    return valid, stats
