"""Inter-file sequence validation (W6, W7) and coverage report (A4).

Parity targets:
- gap/overlap detection between consecutive files — reference
  ``DefaultTimeSeriesValidator.validate_files``, ``ts_validator.py:113-189``
- strategy decision NONE/LENIENT/STRICT/CUSTOM — reference
  ``is_valid_sequence``, ``ts_validator.py:191-248``
- file-coverage report — reference ``generate_time_series_report``,
  ``load_file.py:1023-1102``

The metadata list is tiny (one element per file), so this logic is
driver-side Python; ``interval_issues_df`` exposes the identical lead-window
computation as a DataFrame for SQL users / oracle checks.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import timedelta
from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from time_series_loader_spark.config import TimeSeriesConfig, ValidationStrategy
from time_series_loader_spark.sources.metadata import FileMeta


@dataclass
class SequenceIssue:
    kind: str  # "gap" | "overlap" | "no_time_info"
    left_file: str
    right_file: Optional[str]
    duration: Optional[timedelta]
    flagged: bool  # exceeds configured thresholds


def validate_file_sequence(
    metas: list[FileMeta], config: TimeSeriesConfig
) -> list[SequenceIssue]:
    """W6: walk consecutive (by start_time) file pairs; classify gaps/overlaps."""
    issues: list[SequenceIssue] = []
    timed = [m for m in metas if m.start_time is not None and m.end_time is not None]
    for m in metas:
        if m.start_time is None or m.end_time is None:
            issues.append(
                SequenceIssue("no_time_info", m.filepath, None, None, flagged=False)
            )
    timed = sorted(timed, key=lambda m: m.start_time)
    for cur, nxt in zip(timed, timed[1:]):
        if cur.end_time < nxt.start_time:
            gap = nxt.start_time - cur.end_time
            flagged = (
                config.strategy is not ValidationStrategy.NONE
                and gap > config.max_allowed_gap
            )
            issues.append(SequenceIssue("gap", cur.filepath, nxt.filepath, gap, flagged))
        elif cur.end_time > nxt.start_time:
            overlap = cur.end_time - nxt.start_time
            flagged = (
                config.strategy is ValidationStrategy.STRICT
                or not config.allow_overlap
                or overlap > config.max_allowed_overlap
            )
            issues.append(
                SequenceIssue("overlap", cur.filepath, nxt.filepath, overlap, flagged)
            )
    return issues


def is_valid_sequence(
    metas: list[FileMeta], config: TimeSeriesConfig
) -> tuple[bool, list[str]]:
    """W7: strategy decision over the issue list; (valid, messages)."""
    if config.strategy is ValidationStrategy.CUSTOM:
        if config.validator is None:
            raise ValueError("CUSTOM strategy requires config.validator")
        return config.validator(metas)
    issues = validate_file_sequence(metas, config)
    msgs: list[str] = []
    valid = True
    for i in issues:
        if i.kind == "gap" and i.flagged and config.strategy is ValidationStrategy.STRICT:
            valid = False
            msgs.append(f"gap of {i.duration} between {i.left_file} and {i.right_file}")
        elif i.kind == "overlap" and i.flagged and config.strategy in (
            ValidationStrategy.STRICT,
            ValidationStrategy.LENIENT,
        ):
            valid = False
            msgs.append(
                f"overlap of {i.duration} between {i.left_file} and {i.right_file}"
            )
    if config.strategy is ValidationStrategy.NONE:
        return True, []
    return valid, msgs


def coverage_report(metas: list[FileMeta], config: TimeSeriesConfig) -> dict:
    """A4: per-file durations, span, covered time, coverage %, gap/overlap counts.

    Divergence note (SURVEY.md §7 hard-part (f)): the reference computes the
    report's end as ``min(end_time)`` (``load_file.py:1873-1875``, upstream
    bug); we use ``max``.
    """
    timed = sorted(
        (m for m in metas if m.start_time is not None and m.end_time is not None),
        key=lambda m: m.start_time,
    )
    if not timed:
        return {
            "n_files": len(metas),
            "n_timed_files": 0,
            "span": None,
            "covered": None,
            "coverage_pct": None,
            "gaps": [],
            "overlaps": [],
        }
    span = timed[-1].end_time - timed[0].start_time
    issues = validate_file_sequence(timed, config)
    gaps = [i for i in issues if i.kind == "gap"]
    overlaps = [i for i in issues if i.kind == "overlap"]
    gap_total = sum((i.duration for i in gaps), timedelta(0))
    covered = span - gap_total
    return {
        "n_files": len(metas),
        "n_timed_files": len(timed),
        "start": timed[0].start_time,
        "end": timed[-1].end_time,
        "span": span,
        "covered": covered,
        "coverage_pct": (covered / span * 100.0) if span > timedelta(0) else 100.0,
        "per_file_durations": {m.filepath: m.end_time - m.start_time for m in timed},
        "gaps": gaps,
        "overlaps": overlaps,
    }


def interval_issues_df(
    intervals: DataFrame,
    key_col: str,
    start_col: str = "start_time",
    end_col: str = "end_time",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """DataFrame variant of W6 for arbitrary interval tables: classify the
    step to each next interval as gap/overlap/contiguous with its duration.

    Scales to interval tables of any size (lead window, keyed by
    ``group_cols``), unlike the driver-side list walk.
    """
    w = (
        Window.partitionBy(*group_cols).orderBy(start_col, key_col)
        if group_cols
        else Window.orderBy(start_col, key_col)
    )
    nxt_start = F.lead(start_col).over(w)
    nxt_key = F.lead(key_col).over(w)
    delta = nxt_start.cast("double") - F.col(end_col).cast("double")
    return (
        intervals.select(
            *group_cols,
            F.col(key_col).alias("left_key"),
            nxt_key.alias("right_key"),
            F.col(start_col),
            F.col(end_col),
            delta.alias("step_seconds"),
        )
        .where(F.col("right_key").isNotNull())
        .withColumn(
            "kind",
            F.when(F.col("step_seconds") > 0, F.lit("gap"))
            .when(F.col("step_seconds") < 0, F.lit("overlap"))
            .otherwise(F.lit("contiguous")),
        )
    )
