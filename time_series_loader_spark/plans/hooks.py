"""Extension points: transformers and post-processing hooks (§2.8).

Parity targets:
- ``DataTransformer.transform(df, ts_col, metadata) -> df`` — reference
  ``ts_extensions.py:14-49``
- ``PostProcessingHook.process(df, context) -> df`` with per-hook error
  isolation — reference ``ts_extensions.py:52-75``, ``load_file.py:1839-1861``
- ``OutlierRemovalHook`` — reference ``ts_extensions.py:165-210``

Spark design: hooks are ordered ``DataFrame -> DataFrame`` functions,
composed with ``DataFrame.transform``; everything stays one lazy plan. The
``context`` dict carries driver-side state (counts must be computed lazily
or via accumulators — we record the hook chain, not eager row counts).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

from pyspark.sql import DataFrame

from time_series_loader_spark.errors import ErrorLedger, ErrorSeverity
from time_series_loader_spark.operators.outliers import remove_outliers_zscore


class DataTransformer:
    """Per-source transform applied before the union/sort."""

    def transform(self, df: DataFrame, ts_col: Optional[str], context: dict) -> DataFrame:
        return df


class PostProcessingHook:
    """Ordered post-concat hook; override ``process``."""

    name = "hook"

    def process(self, df: DataFrame, context: dict) -> DataFrame:
        return df


class FunctionHook(PostProcessingHook):
    def __init__(self, name: str, fn: Callable[[DataFrame, dict], DataFrame]):
        self.name = name
        self.fn = fn

    def process(self, df: DataFrame, context: dict) -> DataFrame:
        return self.fn(df, context)


class OutlierRemovalHook(PostProcessingHook):
    name = "outlier_removal"

    def __init__(self, columns: Sequence[str], threshold: float = 3.0):
        self.columns = columns
        self.threshold = threshold

    def process(self, df: DataFrame, context: dict) -> DataFrame:
        return remove_outliers_zscore(df, self.columns, self.threshold)


def apply_hooks(
    df: DataFrame,
    hooks: Sequence[PostProcessingHook],
    context: Optional[dict[str, Any]] = None,
    ledger: Optional[ErrorLedger] = None,
) -> DataFrame:
    """Apply hooks in order; a failing hook is recorded and skipped
    (per-hook error isolation, reference ``load_file.py:1853-1861``)."""
    context = context if context is not None else {}
    out = df
    for h in hooks:
        try:
            out = h.process(out, context)
        except Exception as e:  # noqa: BLE001 - isolation is the contract
            if ledger is not None:
                ledger.record(
                    ErrorSeverity.WARNING,
                    "post_processing_hook_failed",
                    f"hook {h.name!r} failed: {e}",
                    details={"hook": h.name},
                    exc=e,
                )
            context.setdefault("failed_hooks", []).append(h.name)
    return out
