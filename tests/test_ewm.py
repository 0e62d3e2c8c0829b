"""EWMA vs pandas ewm — keyed, unkeyed-distributed, nulls, block
boundaries (the (1-α)^L truncation invariant)."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from time_series_loader_spark.operators.ewm import _block_len, ewm_mean

T0 = dt.datetime(2024, 1, 1)


def _series_df(spark, values, key=None, start=T0, step_s=60):
    rows = [
        (key, start + dt.timedelta(seconds=i * step_s),
         None if v is None else float(v))
        for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(rows, "user_id STRING, ts TIMESTAMP, value DOUBLE")
    return df if key is not None else df.drop("user_id")


def _collect_ewm(df, name="value_ewm"):
    return [r[name] for r in df.orderBy("ts").select(name).collect()]


def _pd_ewm(values, alpha, adjust):
    return pd.Series(values, dtype="float64").ewm(alpha=alpha, adjust=adjust).mean()


@pytest.mark.parametrize("alpha", [0.5, 0.1])
@pytest.mark.parametrize("adjust", [True, False])
def test_keyed_matches_pandas(spark, alpha, adjust):
    rng = np.random.RandomState(7)
    frames, expect = [], {}
    for key in ("a", "b"):
        vals = list(np.round(rng.randn(350).cumsum(), 3))
        frames.append(_series_df(spark, vals, key=key))
        expect[key] = _pd_ewm(vals, alpha, adjust)
    df = frames[0].union(frames[1])
    out = ewm_mean(df, "ts", "value", alpha, group_cols=["user_id"], adjust=adjust)
    for key in ("a", "b"):
        got = [
            r["value_ewm"]
            for r in out.where(F.col("user_id") == key).orderBy("ts").collect()
        ]
        np.testing.assert_allclose(got, expect[key], rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("alpha", [0.5, 0.05])
def test_crosses_many_blocks(spark, alpha):
    """Series much longer than the block length L: the lag(block_end)
    stitch (not a full recursion) must still match pandas."""
    L = _block_len(alpha)
    n = 4 * L + 17
    rng = np.random.RandomState(1)
    vals = list(np.round(100 + rng.randn(n), 4))
    df = _series_df(spark, vals, key="k")
    out = ewm_mean(df, "ts", "value", alpha, group_cols=["user_id"], adjust=False)
    np.testing.assert_allclose(
        _collect_ewm(out), _pd_ewm(vals, alpha, False), rtol=1e-9
    )


def test_nulls_adjust_true(spark):
    """Nulls skip with decay advancing per row (pandas ignore_na=False);
    leading nulls yield null."""
    vals = [None, None, 1.0, None, 2.0, 4.0, None, None, 8.0]
    df = _series_df(spark, vals, key="k")
    out = ewm_mean(df, "ts", "value", 0.3, group_cols=["user_id"], adjust=True)
    exp = _pd_ewm([np.nan if v is None else v for v in vals], 0.3, True)
    got = _collect_ewm(out)
    assert got[0] is None and got[1] is None
    np.testing.assert_allclose(got[2:], exp[2:], rtol=1e-9)


@pytest.mark.parametrize("adjust", [True, False])
@pytest.mark.parametrize("buckets", [3, 8])
def test_unkeyed_distributed_matches_pandas(spark, adjust, buckets):
    """Global-timeline path: time buckets + driver carry scan. Bucket
    row counts are far below L, so the cross-bucket recursion (unlike
    the intra-bucket stitch) is exercised for real."""
    rng = np.random.RandomState(3)
    vals = list(np.round(rng.randn(500).cumsum() + 50, 3))
    df = _series_df(spark, vals)
    out = ewm_mean(df, "ts", "value", 0.2, adjust=adjust, num_buckets=buckets)
    np.testing.assert_allclose(
        _collect_ewm(out), _pd_ewm(vals, 0.2, adjust), rtol=1e-9
    )


def test_unkeyed_degenerate_single_ts(spark):
    df = _series_df(spark, [5.0, 7.0], step_s=0)  # zero span → fallback
    out = ewm_mean(df, "ts", "value", 0.5, adjust=True)
    assert len(_collect_ewm(out)) == 2


def test_alpha_validation(spark):
    df = _series_df(spark, [1.0], key="k")
    with pytest.raises(ValueError):
        ewm_mean(df, "ts", "value", 1.5, group_cols=["user_id"])


def test_output_schema_preserved(spark):
    df = _series_df(spark, [1.0, 2.0, 3.0], key="k")
    out = ewm_mean(df, "ts", "value", 0.4, group_cols=["user_id"], out_col="sm")
    assert set(out.columns) == {"user_id", "ts", "value", "sm"}
    assert out.count() == 3


@pytest.mark.parametrize("keyed", [True, False])
def test_nulls_adjust_false_poison(spark, keyed):
    """adjust=False is undefined past a null input: rows from the first
    null onward must be NULL, never silently-wrong numbers (the
    docstring's no-silent-approximation contract)."""
    vals = [10.0, 20.0, None, 10.0, 30.0]
    df = _series_df(spark, vals, key="k" if keyed else None)
    out = ewm_mean(
        df, "ts", "value", 0.5,
        group_cols=["user_id"] if keyed else (),
        adjust=False,
        num_buckets=None if keyed else 2,
    )
    got = _collect_ewm(out)
    exp = _pd_ewm([10.0, 20.0], 0.5, False)
    np.testing.assert_allclose(got[:2], exp, rtol=1e-9)
    assert got[2] is None and got[3] is None and got[4] is None


def test_ewm_gate_boundary_margins(spark, sf_dir):
    """r6 parity canary for the one gate column still computed via
    DIFFERENT fp paths in the two engines (closed-form block-decay vs
    sequential recursion, plus pow() — a transcendental with
    CPU/build-dependent last-ulp behavior): every ewm03 value on the
    REAL gate data must sit far (>1e-8 scaled) from its shifted-floor
    boundary, so an inter-engine difference up to ~1e-10 absolute can
    never flip the reported 6dp value. If fixture data ever lands a
    value near a boundary, this fails BEFORE the driver gate flakes."""
    import os

    import pytest

    if not os.path.isdir(sf_dir):
        pytest.skip("driver testdata not present")
    # distance from the pre-floor scaled value to the shifted boundary,
    # measured on the raw (unrounded) ewm over the same gate inputs
    from pyspark.sql import functions as F

    from time_series_loader_spark.operators.ewm import ewm_mean
    from time_series_loader_spark.session import read_table

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    raw = ewm_mean(ev, "ts", "value", 0.3, group_cols=["user_id"],
                   adjust=False, out_col="ewm")
    x = F.col("ewm") * 1000000.0 + 0.5001
    dist = F.abs(x - F.round(x))
    # min distance to the nearest integer boundary across every row —
    # F.round here only locates the boundary; parity is not affected
    m = raw.agg(F.min(dist).alias("m")).collect()[0]["m"]
    assert m is not None and m > 1e-8, f"ewm margin too small: {m}"
