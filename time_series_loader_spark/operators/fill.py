"""Forward/backward fill with optional run-length limit (W4).

Parity target: reference ``load_file.py:2341-2345``
(``fillna(method='ffill'/'bfill', limit=n)`` after grid reindex).

Spark-first design (SURVEY.md §4 "custom composition"):
- unlimited ffill: ``last(col, ignorenulls=True)`` over an unbounded-
  preceding window — one pass, JVM-side.
- ``limit=n``: pandas fills at most n consecutive nulls after each non-null.
  We compute the null-run position: a run-id window (count of non-nulls so
  far) partitions rows into runs led by one non-null; ``row_number``-1 within
  the run is the distance from the source value. Fill only where distance
  ≤ n. Two window passes, still no Python.

Scale: windows are keyed by ``group_cols`` when a series key exists —
without one this is a single-partition sort, acceptable only for the
reference's single-timeline model (SURVEY.md §7 hard-part (d)).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _base_window(group_cols: Sequence[str], ts_col: str, desc: bool) -> WindowSpec:
    order = F.col(ts_col).desc() if desc else F.col(ts_col).asc()
    if group_cols:
        return Window.partitionBy(*group_cols).orderBy(order)
    return Window.orderBy(order)


def _fill(
    df: DataFrame,
    ts_col: str,
    cols: Sequence[str],
    limit: int | None,
    group_cols: Sequence[str],
    backward: bool,
) -> DataFrame:
    w = _base_window(group_cols, ts_col, desc=backward)
    w_prec = w.rowsBetween(Window.unboundedPreceding, 0)
    out = df
    for c in cols:
        filled = F.last(c, ignorenulls=True).over(w_prec)
        if limit is None:
            out = out.withColumn(c, filled)
        else:
            # run_id increments at each non-null source row (in fill
            # direction); rows before any source stay run 0 with null fill.
            run_id = F.count(F.when(F.col(c).isNotNull(), 1)).over(w_prec)
            run_w = (
                Window.partitionBy(*group_cols, run_id)
                if group_cols
                else Window.partitionBy(run_id)
            ).orderBy(F.col(ts_col).desc() if backward else F.col(ts_col).asc())
            dist = F.row_number().over(run_w) - 1
            out = out.withColumn(
                c,
                F.when(F.col(c).isNotNull(), F.col(c)).otherwise(
                    F.when(dist <= limit, filled)
                ),
            )
    return out


def ffill(
    df: DataFrame,
    ts_col: str,
    cols: Sequence[str],
    limit: int | None = None,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Propagate the last non-null value forward (at most ``limit`` rows)."""
    return _fill(df, ts_col, cols, limit, group_cols, backward=False)


def bfill(
    df: DataFrame,
    ts_col: str,
    cols: Sequence[str],
    limit: int | None = None,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Propagate the next non-null value backward (at most ``limit`` rows)."""
    return _fill(df, ts_col, cols, limit, group_cols, backward=True)
