"""Linear time interpolation (W5).

Parity target: reference ``load_file.py:2346-2347``
(``df.interpolate(method='time', limit=n)``) — fill each null with the
linear-in-time value between its previous and next non-null neighbors.

Composition (SURVEY.md §4): for each column, four window expressions —
previous non-null value+ts (unbounded preceding) and next non-null value+ts
(unbounded following) — then
``prev + (next-prev) * (ts-prev_ts)/(next_ts-prev_ts)``.

pandas `interpolate` edge semantics matched:
- leading nulls (no previous neighbor) stay null;
- trailing nulls (no next neighbor) carry the last value forward (pandas
  forward-fills the tail under the default ``limit_direction='forward'``);
- ``limit=n`` fills only the first n nulls of each run.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interpolate_time(
    df: DataFrame,
    ts_col: str,
    cols: Sequence[str],
    limit: int | None = None,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    if group_cols:
        w_prev = Window.partitionBy(*group_cols).orderBy(ts_col)
        w_next = Window.partitionBy(*group_cols).orderBy(F.col(ts_col).desc())
    else:
        w_prev = Window.orderBy(ts_col)
        w_next = Window.orderBy(F.col(ts_col).desc())
    w_prev_all = w_prev.rowsBetween(Window.unboundedPreceding, -1)
    w_next_all = w_next.rowsBetween(Window.unboundedPreceding, -1)
    w_run = w_prev.rowsBetween(Window.unboundedPreceding, 0)

    t = F.col(ts_col).cast("double")
    out = df
    for c in cols:
        val = F.col(c)
        nn_ts = F.when(val.isNotNull(), F.col(ts_col))
        prev_v = F.last(c, ignorenulls=True).over(w_prev_all)
        prev_t = F.last(nn_ts, ignorenulls=True).over(w_prev_all).cast("double")
        next_v = F.last(c, ignorenulls=True).over(w_next_all)
        next_t = F.last(nn_ts, ignorenulls=True).over(w_next_all).cast("double")

        interp = F.when(
            next_t.isNotNull() & prev_t.isNotNull() & (next_t != prev_t),
            prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t),
        ).otherwise(prev_v)  # tail: carry forward; head: prev_v is null → null

        if limit is not None:
            run_id = F.count(F.when(val.isNotNull(), 1)).over(w_run)
            run_w = (
                Window.partitionBy(*group_cols, run_id)
                if group_cols
                else Window.partitionBy(run_id)
            ).orderBy(ts_col)
            dist = F.row_number().over(run_w) - 1
            interp = F.when(dist <= limit, interp)

        out = out.withColumn(c, F.when(val.isNotNull(), val).otherwise(interp))
    return out
