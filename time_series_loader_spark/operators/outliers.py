"""Z-score and robust (MAD) outlier removal (P10).

Parity target: reference ``OutlierRemovalHook`` (``ts_extensions.py:165-210``)
— per configured numeric column, drop rows where ``|x - mean| / std >
threshold`` (default 3.0); columns with std == 0 are skipped.

Spark-first: one global ``agg`` computes (mean, stddev) per column; the
1-row stats frame is broadcast-cross-joined back (no shuffle of the fact
side) and a single filter drops outliers. Stddev is ddof=1 (pandas
``Series.std``). With ``group_cols`` the stats become a per-key
aggregate + broadcast-able join — the 100 TB path.

Numeric discipline (round-6 hardening): mean/std come from EXACT
DECIMAL moments — values cast to DECIMAL(18,6), Σx and Σx² accumulated
as decimals (the x² product is a decimal×decimal multiply, exact at
12dp) — then one IEEE division/sqrt. ``F.avg``/``F.stddev_samp`` over
doubles merge partial moments in partition order, so the kept-row SET
could differ between runs for values near the |z| = threshold cutoff;
decimal moments make the stats a pure function of the multiset of
values, bit-identical across partitionings, engines, and CPUs. The
textbook (Σx² − (Σx)²/n) cancellation concern doesn't apply: the sums
are exact, so the only rounding is the final few IEEE ops.
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
        # (18,6) not (19,6): the square must stay EXACT — Spark's product
        # precision is p1+p2+1, so (18,6)² = DECIMAL(37,12) keeps all 12
        # fractional digits, while (19,6)² would hit the 38-digit cap and
        # silently round to scale 11 (losing the 12th digit and decimal
        # parity with the oracle, whose DECIMAL(18,6) product is exact).
        # Bound: |x| < 10^12, ample for any physical reading.
        # try_cast, not cast: NaN/±Inf/|x| ≥ 1e12 become null under BOTH
        # ANSI (where a plain cast would abort the job) and legacy mode,
        # so the moment sums have defined semantics everywhere
        xd = F.col(c).try_cast("decimal(18,6)")
        aggs.append(F.sum(xd).cast("double").alias(f"_sx_{c}"))
        aggs.append(F.sum(xd * xd).cast("double").alias(f"_sx2_{c}"))
        # count the CAST column, not the raw one: a value the cast nulls
        # out must be excluded from n exactly as it is excluded from the
        # sums, or mean/std silently skew (ADVICE r6). Such rows then
        # z-test as NaN/Inf against the clean moments and are removed —
        # they are extreme by definition.
        aggs.append(F.count(xd).alias(f"_n_{c}"))
    moments = df.groupBy(*group_cols).agg(*aggs)
    stat_cols = []
    for c in cols:
        sx, sx2, n = F.col(f"_sx_{c}"), F.col(f"_sx2_{c}"), F.col(f"_n_{c}")
        stat_cols.append((sx / n).alias(f"_mean_{c}"))
        stat_cols.append(
            F.when(
                n >= 2,
                F.sqrt(F.greatest((sx2 - sx * sx / n) / (n - 1), F.lit(0.0))),
            ).alias(f"_std_{c}")
        )
    stats = moments.select(*group_cols, *stat_cols)
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


# MAD→σ consistency constant for normal data (1/Φ⁻¹(3/4)); the Hampel
# identifier's robust z is |x − median| / (1.4826·MAD).
MAD_SCALE = 1.4826


def remove_outliers_mad(
    df: DataFrame,
    cols: Sequence[str],
    threshold: float = 3.5,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Hampel-style robust outlier removal: drop rows where
    |x − median| / (1.4826·MAD) > ``threshold`` (default 3.5, the
    standard Hampel cutoff).

    Beyond-reference robustness upgrade to ``remove_outliers_zscore``:
    mean/std are themselves dragged by the outliers they're meant to
    catch (masking); median/MAD have a 50% breakdown point, so a heavy
    contaminated tail — the normal case in scraped training data — can't
    hide itself. Columns where MAD == 0 (>50% of values identical) are
    skipped, mirroring the std == 0 rule; null values are kept.

    Scale shape: two aggregation passes (median, then median absolute
    deviation — MAD is a nested order statistic and cannot be computed in
    one pass), each producing a 1-row (or 1-per-group) stats frame that
    broadcasts back; the fact side is never shuffled. Exact
    ``percentile`` keeps oracle parity; at 100 TB swap for
    ``approx_percentile`` (t-digest sketch, one pass each) — the cutoff
    is a heuristic threshold, not an exact-arithmetic contract.
    """
    med_aggs = [F.percentile(c, 0.5).alias(f"_med_{c}") for c in cols]
    med = df.groupBy(*group_cols).agg(*med_aggs)

    def _attach(frame: DataFrame, stats: DataFrame) -> DataFrame:
        return (
            frame.join(F.broadcast(stats), list(group_cols), "left")
            if group_cols
            else frame.crossJoin(F.broadcast(stats))
        )

    with_med = _attach(df, med)
    mad_aggs = [
        F.percentile(F.abs(F.col(c) - F.col(f"_med_{c}")), 0.5).alias(f"_mad_{c}")
        for c in cols
    ]
    mad = with_med.groupBy(*group_cols).agg(*mad_aggs)

    joined = _attach(with_med, mad)
    keep = F.lit(True)
    for c in cols:
        m = F.col(f"_mad_{c}")
        z = F.abs(F.col(c) - F.col(f"_med_{c}")) / (F.lit(MAD_SCALE) * m)
        keep = keep & (m.isNull() | (m == 0) | F.col(c).isNull() | (z <= threshold))
    drop = [f"_med_{c}" for c in cols] + [f"_mad_{c}" for c in cols]
    return joined.where(keep).drop(*drop)


def _local_robust_z(
    keyed: "DataFrame",
    keys: list,
    value_col: str,
    med_col: str,
    z_col: str,
    broadcast_stats: bool,
) -> DataFrame:
    """Shared median/MAD/robust-z machinery for the local-statistics
    detectors (:func:`hampel_flags`, :func:`seasonal_baseline`): two
    aggregation passes (median, then MAD — a nested order statistic),
    stats joined back with LEFT joins so rows whose key is null (null
    timestamp / null group value) ride through annotated with a null z
    instead of silently vanishing (equality joins never match null
    keys — the bug class an inner join would reintroduce).

    ``broadcast_stats``: force-broadcast only when the stats cardinality
    is BOUNDED (seasonal profiles: ≤168 slots × groups). Unbounded
    bucket stats (hampel at fine freq × many series) are left to AQE,
    which broadcasts small frames and shuffle-joins big ones.
    """
    maybe_b = F.broadcast if broadcast_stats else (lambda x: x)
    med = keyed.groupBy(*keys).agg(F.percentile(value_col, 0.5).alias(med_col))
    with_med = keyed.join(maybe_b(med), keys, "left")
    mad = with_med.groupBy(*keys).agg(
        F.percentile(F.abs(F.col(value_col) - F.col(med_col)), 0.5).alias("_mad")
    )
    joined = with_med.join(maybe_b(mad), keys, "left")
    z = F.when(
        (F.col("_mad") > 0) & F.col(value_col).isNotNull(),
        F.abs(F.col(value_col) - F.col(med_col)) / (F.lit(MAD_SCALE) * F.col("_mad")),
    )
    return joined.withColumn(z_col, z).drop("_mad")


def hampel_flags(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    freq: str | int = "1h",
    threshold: float = 3.5,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Time-local Hampel spike detection: flag each point against the
    median/MAD of ITS OWN time bucket — a level-shifting series (daily
    cycles, trends) makes global median/MAD useless, and the classical
    sliding-window Hampel filter needs a rolling median (O(w) order
    statistics per row, no distributed form without per-row re-sorts).
    Tumbling buckets give the same local robustness at groupBy cost:
    two aggregation passes over bucket partials (median, then MAD —
    nested order statistic), per-bucket stats joined back (AQE
    broadcasts them while they fit; at fine freq × many series the
    stats cardinality is unbounded, so broadcast is NOT forced), and
    the fact side never reshuffles.

    Appends ``bucket_ts``, ``robust_z`` (|x − bucket median| /
    (1.4826·MAD); null when the bucket's MAD is 0, x is null, or the
    row's timestamp/group key is null) and ``is_outlier`` (false in
    those degenerate cases — a flat bucket flags nothing, matching
    ``remove_outliers_mad``'s skip rule). Row-preserving: null-key rows
    ride through annotated, never dropped. Deterministic: exact
    percentile, no sampling.
    """
    from time_series_loader_spark.operators.resample import bucket_start
    from time_series_loader_spark.functions.frequency import freq_to_seconds

    step = freq_to_seconds(freq)
    keyed = df.withColumn("bucket_ts", bucket_start(ts_col, step))
    out = _local_robust_z(
        keyed, [*group_cols, "bucket_ts"], value_col, "_med", "robust_z",
        broadcast_stats=False,
    )
    return out.withColumn(
        "is_outlier", F.coalesce(F.col("robust_z") > threshold, F.lit(False))
    ).drop("_med")


SEASON_KEYS = {
    "hour_of_day": lambda ts: F.hour(ts),
    "day_of_week": lambda ts: F.dayofweek(ts),
    "hour_of_week": lambda ts: (F.dayofweek(ts) - 1) * 24 + F.hour(ts),
    "minute_of_hour": lambda ts: F.minute(ts),
}


def seasonal_baseline(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    period: str = "hour_of_day",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Seasonal-profile baseline + robust residual: each row gets its
    season slot's median (``season_median``), MAD-scaled residual
    (``seasonal_z``), and the slot key (``season``) — the seasonal
    counterpart to :func:`hampel_flags`: a metric that peaks every day
    at 9am is NORMAL at 9am and an anomaly at 3am, which neither global
    nor time-bucket-local statistics can express.

    ``period``: 'hour_of_day' (24 slots), 'day_of_week' (7),
    'hour_of_week' (168), 'minute_of_hour' (60).

    Scale shape: the profile is a ≤168-row (× groups) aggregate —
    ALWAYS broadcastable, so broadcast is forced; two passes (median,
    then MAD, both exact percentile — swap for ``approx_percentile`` at
    TB scale) and the fact side never reshuffles. Row-preserving (LEFT
    stats joins — see ``_local_robust_z``): seasonal_z is null when the
    slot's MAD is 0, the value is null, or the timestamp is null.
    """
    if period not in SEASON_KEYS:
        raise ValueError(f"period must be one of {sorted(SEASON_KEYS)}")
    season = SEASON_KEYS[period](F.col(ts_col)).cast("int")
    keyed = df.withColumn("season", season)
    return _local_robust_z(
        keyed, [*group_cols, "season"], value_col, "season_median", "seasonal_z",
        broadcast_stats=True,
    )
