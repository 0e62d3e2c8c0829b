"""Per-series OLS trend slope (operators/trend.py)."""

from datetime import datetime, timedelta

import numpy as np
import pytest
from pyspark.sql import functions as F

from time_series_loader_spark.operators.trend import trend_slope

T0 = datetime(2024, 1, 1)


def _series(key, pairs):
    return [(key, T0 + timedelta(seconds=s), float(v)) for s, v in pairs]


@pytest.fixture(scope="module")
def series_df(spark):
    rows = (
        # exact line v = 2.5·x + 1 → slope 2.5
        _series("up", [(0, 1.0), (10, 26.0), (20, 51.0), (30, 76.0)])
        # exact negative line v = −0.75·x + 100 (negative-truncation parity)
        + _series("down", [(0, 100.0), (4, 97.0), (8, 94.0)])
        # constant series → slope 0
        + _series("flat", [(0, 5.0), (60, 5.0), (120, 5.0)])
        # single point and zero-x-variance → NULL
        + _series("one", [(0, 3.0)])
        + _series("same_ts", [(7, 1.0), (7, 9.0)])
        # noisy series for the numpy differential
        + _series("noisy", [(0, 1.2), (5, 2.9), (11, 3.1), (17, 6.4), (23, 6.0)])
    )
    return spark.createDataFrame(rows, ["series", "ts", "value"])


def test_exact_lines_and_null_contracts(series_df):
    got = {
        r["series"]: (r["n"], r["slope_nano"])
        for r in trend_slope(series_df, "ts", "value", ["series"]).collect()
    }
    assert got["up"] == (4, 2_500_000_000)
    assert got["down"] == (3, -750_000_000)
    assert got["flat"] == (3, 0)
    assert got["one"] == (1, None)
    assert got["same_ts"] == (2, None)


def test_matches_numpy_polyfit(series_df):
    got = {
        r["series"]: r["slope_nano"]
        for r in trend_slope(series_df, "ts", "value", ["series"]).collect()
    }
    xs = np.array([0, 5, 11, 17, 23], dtype=float)
    vs = np.array([1.2, 2.9, 3.1, 6.4, 6.0])
    ref = np.polyfit(xs, vs, 1)[0]
    # value quantization (≤0.5µ per reading) + final truncation (1 nano)
    assert abs(got["noisy"] / 1e9 - ref) < 1e-6


def test_excludes_unusable_readings(spark):
    rows = _series("k", [(0, 0.0), (10, 25.0), (20, 50.0)]) + [
        ("k", T0 + timedelta(seconds=15), float("nan")),
        ("k", T0 + timedelta(seconds=16), float("inf")),
    ]
    df = spark.createDataFrame(rows, ["series", "ts", "value"])
    got = trend_slope(df, "ts", "value", ["series"]).collect()[0]
    assert got["n"] == 3 and got["slope_nano"] == 2_500_000_000


def test_partition_invariance(series_df):
    a = sorted(map(tuple, trend_slope(series_df, "ts", "value", ["series"]).collect()))
    b = sorted(
        map(
            tuple,
            trend_slope(
                series_df.repartition(9), "ts", "value", ["series"]
            ).collect(),
        )
    )
    assert a == b


def _ref_cusum(vals, threshold):
    mean = sum(vals) / len(vals)
    sp = sn = 0.0
    fp = fn = 0
    mp = mn = 0.0
    for v in vals:
        d = v - mean
        sp = max(0.0, sp + d)
        sn = max(0.0, sn - d)
        mp, mn = max(mp, sp), max(mn, sn)
        fp += sp > threshold
        fn += sn > threshold
    return fp, fn, mp, mn


def test_cusum_matches_sequential_reference(spark):
    from time_series_loader_spark.operators.trend import cusum_stats

    vals = [10.0, 10.2, 9.9, 10.1, 13.0, 13.2, 12.9, 13.1, 13.0, 12.8]
    rows = [("k", T0 + timedelta(seconds=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["series", "ts", "value"])
    got = cusum_stats(df, "ts", "value", ["series"], threshold=2.0).collect()[0]
    fp, fn, mp, mn = _ref_cusum(vals, 2.0)
    assert (got["n"], got["n_flags_pos"], got["n_flags_neg"]) == (10, fp, fn)
    assert abs(got["max_cusum_pos_u"] / 1e6 - mp) < 2e-6
    assert abs(got["max_cusum_neg_u"] / 1e6 - mn) < 2e-6
    # mean-referenced CUSUM flags BOTH sides of a step change (below
    # the global mean before the step, above it after) — the classic
    # step signature, matching the sequential reference exactly
    assert got["n_flags_pos"] > 0 and got["n_flags_neg"] > 0


def test_cusum_flat_series_and_partition_invariance(spark):
    from time_series_loader_spark.operators.trend import cusum_stats

    rows = [("a", T0 + timedelta(seconds=i), 5.0) for i in range(20)] + [
        ("b", T0 + timedelta(seconds=i), float(i)) for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["series", "ts", "value"])
    got = {r["series"]: tuple(r) for r in cusum_stats(
        df, "ts", "value", ["series"], threshold=1.0
    ).collect()}
    assert got["a"][1:] == (20, 0, 0, 0, 0)  # flat: no drift either side
    # monotone ramp drifts BOTH ways around its own mean
    assert got["b"][2] > 0 and got["b"][3] > 0
    re = {r["series"]: tuple(r) for r in cusum_stats(
        df.repartition(11), "ts", "value", ["series"], threshold=1.0
    ).collect()}
    assert got == re


def test_trend_slope_no_bigint_wrap_large_values(spark):
    """ADVICE r7 (high): x·vu must be multiplied as DECIMAL(38,0), not
    BIGINT — |v|~3e5 over a year gives x·vu > 2^63 while each factor is
    well inside the documented |v| < 1e12 envelope. The expected slope
    is the exact closed form evaluated in arbitrary-precision Python."""
    from time_series_loader_spark.operators.trend import trend_slope

    year = 365 * 86400
    pts = [(0, 300_000.0), (year // 2, -250_000.0), (year, 310_000.0)]
    rows = [
        ("k", T0 + timedelta(seconds=x), v) for x, v in pts
    ]
    df = spark.createDataFrame(rows, ["series", "ts", "value"])
    got = trend_slope(df, "ts", "value", ["series"]).collect()[0]
    xs = [x for x, _ in pts]
    vs = [int(v * 1_000_000) for _, v in pts]
    n = len(pts)
    num = n * sum(x * v for x, v in zip(xs, vs)) - sum(xs) * sum(vs)
    den = n * sum(x * x for x in xs) - sum(xs) ** 2
    want = (abs(num) * 1000) // den * (-1 if num < 0 else 1)
    assert got["slope_nano"] == want


def test_fused_equals_standalones(spark):
    """trend_cusum_stats must be row-for-row identical to running
    trend_slope and self-mean cusum_stats separately — including their
    DIFFERENT null filters (cusum keeps timestamp-less readings, trend
    drops them) and repeated-timestamp tie-breaking."""
    from time_series_loader_spark.operators.trend import (
        cusum_stats,
        trend_cusum_stats,
        trend_slope,
    )

    rows = (
        _series("up", [(0, 1.0), (10, 26.0), (20, 51.0), (30, 76.0)])
        + _series("noisy", [(0, 1.2), (5, 2.9), (11, 3.1), (17, 6.4), (23, 6.0)])
        + _series("one", [(0, 3.0)])
        + _series("same_ts", [(7, 1.0), (7, 9.0)])
        + _series("step", [(i, 10.0 if i < 5 else 13.0) for i in range(10)])
        # unusable reading (excluded everywhere) + timestamp-less
        # reading (cusum keeps it, trend drops it)
        + [("gappy", T0, 1.0), ("gappy", None, 2.0),
           ("gappy", T0 + timedelta(seconds=9), float("nan"))]
    )
    df = spark.createDataFrame(rows, ["series", "ts", "value"]).withColumn(
        "event_id", F.monotonically_increasing_id()
    )
    fused = {
        r["series"]: r
        for r in trend_cusum_stats(
            df, "ts", "value", ["series"], threshold=1.0,
            order_cols=["event_id"],
        ).collect()
    }
    tr = {
        r["series"]: r
        for r in trend_slope(df, "ts", "value", ["series"]).collect()
    }
    cu = {
        r["series"]: r
        for r in cusum_stats(
            df, "ts", "value", ["series"], threshold=1.0,
            order_cols=["event_id"],
        ).collect()
    }
    assert set(fused) == set(cu)  # cusum's base defines the group set
    for key, f in fused.items():
        c = cu[key]
        assert (
            f["n"], f["n_flags_pos"], f["n_flags_neg"],
            f["max_cusum_pos_u"], f["max_cusum_neg_u"],
        ) == (
            c["n"], c["n_flags_pos"], c["n_flags_neg"],
            c["max_cusum_pos_u"], c["max_cusum_neg_u"],
        ), key
        if key in tr:
            assert (f["n_trend"], f["slope_nano"]) == (
                tr[key]["n"], tr[key]["slope_nano"]
            ), key
        else:
            assert f["n_trend"] == 0, key
    # partition invariance of the fused form
    re = {
        r["series"]: r
        for r in trend_cusum_stats(
            df.repartition(7), "ts", "value", ["series"], threshold=1.0,
            order_cols=["event_id"],
        ).collect()
    }
    assert {k: tuple(v) for k, v in fused.items()} == {
        k: tuple(v) for k, v in re.items()
    }
