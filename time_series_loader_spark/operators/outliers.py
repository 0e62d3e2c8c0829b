"""Z-score outlier removal (P10).

Parity target: reference ``OutlierRemovalHook`` (``ts_extensions.py:165-210``)
— per configured numeric column, drop rows where ``|x - mean| / std >
threshold`` (default 3.0); columns with std == 0 are skipped.

Spark-first: one global ``agg`` computes (mean, stddev) per column; the
1-row stats frame is broadcast-cross-joined back (no shuffle of the fact
side) and a single filter drops outliers. ``stddev_samp`` matches pandas
``Series.std`` (ddof=1). With ``group_cols`` the stats become a per-key
aggregate + broadcast-able join — the 100 TB path.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def remove_outliers_zscore(
    df: DataFrame,
    cols: Sequence[str],
    threshold: float = 3.0,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    aggs = []
    for c in cols:
        aggs.append(F.avg(c).alias(f"_mean_{c}"))
        aggs.append(F.stddev_samp(c).alias(f"_std_{c}"))
    stats = df.groupBy(*group_cols).agg(*aggs)
    joined = (
        df.join(F.broadcast(stats), list(group_cols), "left")
        if group_cols
        else df.crossJoin(F.broadcast(stats))
    )
    keep = F.lit(True)
    for c in cols:
        std = F.col(f"_std_{c}")
        z = F.abs((F.col(c) - F.col(f"_mean_{c}")) / std)
        # std null (n<2) or 0 → column skipped (keep all), as in reference
        keep = keep & (std.isNull() | (std == 0) | F.col(c).isNull() | (z <= threshold))
    drop = [f"_mean_{c}" for c in cols] + [f"_std_{c}" for c in cols]
    return joined.where(keep).drop(*drop)
