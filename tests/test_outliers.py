"""Outlier removal: z-score (P10 parity) and Hampel/MAD (robust)."""

import pytest

from time_series_loader_spark.operators.outliers import (
    MAD_SCALE,
    remove_outliers_mad,
    remove_outliers_zscore,
)


def _vals(df):
    return sorted(r["x"] for r in df.collect() if r["x"] is not None)


def test_zscore_drops_tail(spark):
    rows = [(float(i),) for i in range(20)] + [(1000.0,)]
    df = spark.createDataFrame(rows, "x DOUBLE")
    out = _vals(remove_outliers_zscore(df, ["x"], threshold=3.0))
    assert 1000.0 not in out and len(out) == 20


def test_mad_catches_masked_cluster(spark):
    """A CLUSTER of outliers inflates std enough that z-score keeps all of
    them (masking); median/MAD is unmoved and drops every one."""
    base = [(float(i % 10),) for i in range(50)]  # values 0..9
    junk = [(500.0,)] * 10
    df = spark.createDataFrame(base + junk, "x DOUBLE")
    z = _vals(remove_outliers_zscore(df, ["x"], threshold=3.0))
    m = _vals(remove_outliers_mad(df, ["x"], threshold=3.5))
    assert 500.0 in z  # masked: the cluster inflates std to ~185 → z ≈ 2.2
    assert max(m) <= 9.0 and len(m) == 50  # MAD identifies all ten


def test_mad_zero_skips_column(spark):
    """> 50% identical values → MAD == 0 → column skipped (keep all),
    mirroring the std == 0 rule."""
    rows = [(5.0,)] * 30 + [(9999.0,)]
    df = spark.createDataFrame(rows, "x DOUBLE")
    assert remove_outliers_mad(df, ["x"], threshold=3.5).count() == 31


def test_mad_keeps_nulls_and_exact_threshold(spark):
    rows = [(None,), (1.0,), (2.0,), (3.0,), (4.0,), (5.0,)]
    df = spark.createDataFrame(rows, "x DOUBLE")
    out = remove_outliers_mad(df, ["x"], threshold=3.5)
    assert out.count() == 6  # median 3, MAD 1 → max robust z = 2/1.4826 ≈ 1.35


def test_mad_grouped(spark):
    """Per-group medians: an outlier for series 'a' is a normal value for
    series 'b'."""
    rows = [("a", float(v)) for v in range(10)] + [("a", 400.0)] + [
        ("b", float(v)) for v in range(395, 406)
    ]
    df = spark.createDataFrame(rows, "k STRING, x DOUBLE")
    out = remove_outliers_mad(df, ["x"], threshold=3.5, group_cols=["k"])
    kept = {(r["k"], r["x"]) for r in out.collect()}
    assert ("a", 400.0) not in kept
    assert ("b", 400.0) in kept and ("b", 395.0) in kept


def test_mad_matches_manual_hampel(spark):
    import statistics

    vals = [1.0, 2.0, 2.5, 3.0, 3.5, 4.0, 9.0, 50.0]
    med = statistics.median(vals)
    mad = statistics.median(abs(v - med) for v in vals)
    expect = [v for v in vals if abs(v - med) / (MAD_SCALE * mad) <= 3.5]
    df = spark.createDataFrame([(v,) for v in vals], "x DOUBLE")
    assert _vals(remove_outliers_mad(df, ["x"], threshold=3.5)) == sorted(expect)


def test_hampel_flags_bucketed_spikes(spark):
    """A spike that is normal GLOBALLY but absurd for its hour must flag;
    level shifts between buckets must not."""
    from datetime import datetime, timedelta

    from time_series_loader_spark.operators.outliers import hampel_flags

    base = datetime(2023, 1, 1)
    rows = []
    # hour 0: values ~10; hour 1: values ~1000 (level shift, all normal)
    for m in range(0, 60, 5):
        rows.append((base + timedelta(minutes=m), 10.0 + (m % 3)))
        rows.append((base + timedelta(hours=1, minutes=m), 1000.0 + (m % 3)))
    # the spike: 500 at minute 30 of hour 0 — between the two levels
    # globally (median of all ≈ 500-ish region is plausible), wild locally
    rows.append((base + timedelta(minutes=32), 500.0))
    df = spark.createDataFrame(rows, "ts TIMESTAMP, value DOUBLE")
    out = hampel_flags(df, "ts", "value", "1h", threshold=3.5)
    flagged = [(r["ts"], r["value"]) for r in out.collect() if r["is_outlier"]]
    assert flagged == [(base + timedelta(minutes=32), 500.0)]


def test_hampel_flags_degenerate_and_null(spark):
    from datetime import datetime, timedelta

    from time_series_loader_spark.operators.outliers import hampel_flags

    base = datetime(2023, 1, 1)
    rows = [(base + timedelta(minutes=m), 5.0) for m in range(0, 30, 5)]
    rows.append((base + timedelta(minutes=35), None))
    df = spark.createDataFrame(rows, "ts TIMESTAMP, value DOUBLE")
    out = hampel_flags(df, "ts", "value", "1h").collect()
    # flat bucket: MAD 0 → nothing flagged, robust_z null
    assert all(not r["is_outlier"] for r in out)
    assert all(r["robust_z"] is None for r in out)
    assert len(out) == 7  # null-value row rides through


def test_hampel_flags_duckdb_differential(spark):
    """Bucket median/MAD arithmetic replicated in SQL."""
    import duckdb
    import pandas as pd
    from datetime import datetime, timedelta

    from time_series_loader_spark.operators.outliers import hampel_flags

    base = datetime(2023, 1, 1)
    rows = [
        (base + timedelta(minutes=7 * i), float((i * 13) % 29) + (50.0 if i == 11 else 0.0))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "ts TIMESTAMP, value DOUBLE")
    got = {
        (r["ts"], round(r["robust_z"], 9) if r["robust_z"] is not None else None,
         r["is_outlier"])
        for r in hampel_flags(df, "ts", "value", "1h", threshold=2.0).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["ts", "value"]))
    duck = con.execute(
        """
        WITH b AS (SELECT ts, value, time_bucket(INTERVAL '1 hour', ts) AS bt FROM t),
        med AS (SELECT bt, quantile_cont(value, 0.5) AS m FROM b GROUP BY 1),
        mad AS (SELECT b.bt, quantile_cont(abs(b.value - med.m), 0.5) AS md
                FROM b JOIN med USING (bt) GROUP BY 1)
        SELECT b.ts,
               CASE WHEN mad.md > 0 THEN round(abs(b.value - med.m) / (1.4826 * mad.md), 9) END AS z,
               coalesce(CASE WHEN mad.md > 0
                        THEN abs(b.value - med.m) / (1.4826 * mad.md) > 2.0 END, FALSE) AS flag
        FROM b JOIN med USING (bt) JOIN mad USING (bt)
        """
    ).fetchall()
    assert got == set(duck)


def test_seasonal_baseline_hour_of_day(spark):
    """A 3am value at the 9am level must score a huge seasonal_z; the
    same value AT 9am scores ~0."""
    from datetime import datetime, timedelta

    from time_series_loader_spark.operators.outliers import seasonal_baseline

    rows = []
    for day in range(7):
        for h in range(24):
            lvl = 100.0 if h == 9 else 10.0
            rows.append((datetime(2023, 1, 1 + day, h), lvl + day * 0.5))
    rows.append((datetime(2023, 1, 8, 3), 100.0))  # 9am level at 3am
    df = spark.createDataFrame(rows, "ts TIMESTAMP, value DOUBLE")
    out = seasonal_baseline(df, "ts", "value", "hour_of_day")
    by = {(r["ts"]): r for r in out.collect()}
    spike = by[datetime(2023, 1, 8, 3)]
    assert spike["season"] == 3
    assert spike["seasonal_z"] > 10
    # the 9am rows themselves are unremarkable within their slot
    nine = by[datetime(2023, 1, 3, 9)]
    assert nine["seasonal_z"] is None or nine["seasonal_z"] < 3


def test_seasonal_baseline_duckdb_differential(spark):
    import duckdb
    import pandas as pd
    from datetime import datetime, timedelta

    from time_series_loader_spark.operators.outliers import seasonal_baseline

    base = datetime(2023, 1, 1)
    rows = [
        (base + timedelta(hours=i), float((i * 17) % 23) + (i % 24))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "ts TIMESTAMP, value DOUBLE")
    got = {
        (r["ts"], r["season"], round(r["season_median"], 9),
         round(r["seasonal_z"], 9) if r["seasonal_z"] is not None else None)
        for r in seasonal_baseline(df, "ts", "value", "hour_of_day").collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["ts", "value"]))
    duck = set(
        con.execute(
            """
            WITH b AS (SELECT ts, value, CAST(hour(ts) AS INT) AS season FROM t),
            med AS (SELECT season, quantile_cont(value, 0.5) AS m FROM b GROUP BY 1),
            mad AS (SELECT b.season, quantile_cont(abs(b.value - med.m), 0.5) AS md
                    FROM b JOIN med USING (season) GROUP BY 1)
            SELECT b.ts, b.season, round(med.m, 9),
                   CASE WHEN mad.md > 0
                        THEN round(abs(b.value - med.m) / (1.4826 * mad.md), 9) END
            FROM b JOIN med USING (season) JOIN mad USING (season)
            """
        ).fetchall()
    )
    assert got == duck


def test_seasonal_baseline_bad_period(spark):
    from time_series_loader_spark.operators.outliers import seasonal_baseline

    df = spark.createDataFrame([], "ts TIMESTAMP, value DOUBLE")
    with pytest.raises(ValueError, match="period"):
        seasonal_baseline(df, "ts", "value", "phase_of_moon")


def test_local_detectors_preserve_null_key_rows(spark):
    """Review finding: null timestamps must ride through annotated (null
    z, false flag), never silently dropped by an inner stats join."""
    from datetime import datetime, timedelta

    from time_series_loader_spark.operators.outliers import (
        hampel_flags,
        seasonal_baseline,
    )

    base = datetime(2023, 1, 1)
    rows = [(base + timedelta(minutes=m), float(m)) for m in range(0, 50, 10)]
    rows.append((None, 42.0))
    df = spark.createDataFrame(rows, "ts TIMESTAMP, value DOUBLE")

    h = hampel_flags(df, "ts", "value", "1h")
    assert h.count() == 6
    nullrow = [r for r in h.collect() if r["ts"] is None][0]
    assert nullrow["robust_z"] is None and nullrow["is_outlier"] is False

    s = seasonal_baseline(df, "ts", "value", "hour_of_day")
    assert s.count() == 6
    nullrow = [r for r in s.collect() if r["ts"] is None][0]
    assert nullrow["seasonal_z"] is None


def test_zscore_nonfinite_excluded_from_moments(spark):
    """ADVICE r6: values the DECIMAL(18,6) cast nulls out (NaN, Inf,
    |x| ≥ 1e12) must be excluded from n exactly as from the sums — the
    clean rows' mean/std (and kept set) must match the same data without
    the non-finite rows; the non-finite rows themselves are removed."""
    from time_series_loader_spark.operators.outliers import (
        remove_outliers_zscore,
    )

    clean = [float(v) for v in [10, 11, 9, 10, 12, 8, 10, 11, 9, 1000]]
    dirty = clean + [float("nan"), float("inf"), 5e13]
    mk = lambda vals: spark.createDataFrame([(v,) for v in vals], "x DOUBLE")
    kept_clean = sorted(
        r["x"] for r in remove_outliers_zscore(mk(clean), ["x"], 2.0).collect()
    )
    kept_dirty = sorted(
        r["x"] for r in remove_outliers_zscore(mk(dirty), ["x"], 2.0).collect()
    )
    assert kept_clean == kept_dirty  # same stats → same kept set
    assert 1000.0 not in kept_clean  # the genuine outlier still goes
