"""Structured error ledger.

Parity with the reference's error subsystem (reference
``error_handling.py:9-15`` severity enum, ``:177-235`` ProcessingError;
report assembly ``load_file.py:292-342``; JSON/CSV export
``load_file.py:344-360,420-526``).

The ledger is driver-side state (error volume is tiny — per-file and
per-stage, not per-row). Row-level bad records are instead handled
Spark-natively with PERMISSIVE mode / ``columnNameOfCorruptRecord`` — a
capability the reference lacks (it fails whole files).
"""

from __future__ import annotations

import csv
import json
import traceback
from dataclasses import dataclass, field
from datetime import datetime, timezone
from enum import Enum
from typing import Any, Optional


class ErrorSeverity(Enum):
    CRITICAL = "CRITICAL"
    ERROR = "ERROR"
    WARNING = "WARNING"
    INFO = "INFO"


@dataclass
class ProcessingError:
    timestamp: str
    severity: ErrorSeverity
    error_type: str
    message: str
    file: Optional[str] = None
    details: dict[str, Any] = field(default_factory=dict)
    stacktrace: Optional[str] = None

    def to_dict(self) -> dict[str, Any]:
        return {
            "timestamp": self.timestamp,
            "severity": self.severity.value,
            "error_type": self.error_type,
            "message": self.message,
            "file": self.file,
            "details": self.details,
            "stacktrace": self.stacktrace,
        }


class ErrorLedger:
    """Collects ProcessingErrors; CRITICAL re-raises (reference
    ``load_file.py:289-290`` severity-based abort)."""

    def __init__(self) -> None:
        self.errors: list[ProcessingError] = []

    def record(
        self,
        severity: ErrorSeverity,
        error_type: str,
        message: str,
        file: Optional[str] = None,
        details: Optional[dict[str, Any]] = None,
        exc: Optional[BaseException] = None,
    ) -> ProcessingError:
        err = ProcessingError(
            timestamp=datetime.now(timezone.utc).isoformat(),
            severity=severity,
            error_type=error_type,
            message=message,
            file=file,
            details=details or {},
            stacktrace="".join(traceback.format_exception(exc)) if exc else None,
        )
        self.errors.append(err)
        if severity is ErrorSeverity.CRITICAL:
            raise RuntimeError(f"CRITICAL {error_type}: {message}") from exc
        return err

    # --- aggregation (reference load_file.py:305-342) -------------------

    def report(self) -> dict[str, Any]:
        by_severity: dict[str, int] = {}
        by_type: dict[str, int] = {}
        by_file: dict[str, int] = {}
        for e in self.errors:
            by_severity[e.severity.value] = by_severity.get(e.severity.value, 0) + 1
            by_type[e.error_type] = by_type.get(e.error_type, 0) + 1
            if e.file:
                by_file[e.file] = by_file.get(e.file, 0) + 1
        return {
            "total_errors": len(self.errors),
            "by_severity": by_severity,
            "by_type": by_type,
            "by_file": by_file,
            "errors": [e.to_dict() for e in self.errors],
        }

    # --- sinks (reference load_file.py:344-360, 420-526) ----------------

    def export_json(
        self,
        path: str,
        severities: Optional[set[ErrorSeverity]] = None,
        error_types: Optional[set[str]] = None,
    ) -> None:
        with open(path, "w", encoding="utf-8") as f:
            json.dump(self._filtered_dicts(severities, error_types), f, indent=2)

    def export_csv(
        self,
        path: str,
        severities: Optional[set[ErrorSeverity]] = None,
        error_types: Optional[set[str]] = None,
    ) -> None:
        rows = self._filtered_dicts(severities, error_types)
        cols = ["timestamp", "severity", "error_type", "message", "file", "details", "stacktrace"]
        with open(path, "w", newline="", encoding="utf-8") as f:
            w = csv.DictWriter(f, fieldnames=cols)
            w.writeheader()
            for r in rows:
                r = dict(r)
                r["details"] = json.dumps(r["details"])
                w.writerow(r)

    def _filtered_dicts(self, severities, error_types) -> list[dict[str, Any]]:
        out = []
        for e in self.errors:
            if severities and e.severity not in severities:
                continue
            if error_types and e.error_type not in error_types:
                continue
            out.append(e.to_dict())
        return out
