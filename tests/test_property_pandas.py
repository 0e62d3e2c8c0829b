"""Property-based differential tests vs pandas (SURVEY.md §5 'our plan').

Random small series → the Spark composition must match pandas exactly for
ffill/bfill limits, time interpolation, and merge_asof in all directions.
These compositions have the subtlest null-run/tie logic in the engine
(SURVEY.md §7 hard parts (a)/(b)).
"""

from datetime import datetime, timedelta

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from time_series_loader_spark.operators.asof import asof_nearest
from time_series_loader_spark.operators.fill import bfill, ffill
from time_series_loader_spark.operators.interpolate import interpolate_time

BASE = datetime(2023, 1, 1)

series_strategy = st.lists(
    st.one_of(st.none(), st.floats(-100, 100, allow_nan=False)),
    min_size=2,
    max_size=12,
)

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _spark_df(spark, values):
    rows = [(BASE + timedelta(hours=i), v) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "ts TIMESTAMP, v DOUBLE")


def _pd_series(values):
    idx = pd.date_range(BASE, periods=len(values), freq="h")
    return pd.Series([np.nan if v is None else v for v in values], index=idx)


def _match(got, exp):
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        if g is None:
            assert np.isnan(e), (got, list(exp))
        else:
            assert g == pytest.approx(e, abs=1e-9), (got, list(exp))


@given(values=series_strategy, limit=st.one_of(st.none(), st.integers(1, 4)))
@SETTINGS
def test_ffill_property(spark, values, limit):
    got = [r["v"] for r in ffill(_spark_df(spark, values), "ts", ["v"], limit=limit).orderBy("ts").collect()]
    _match(got, _pd_series(values).ffill(limit=limit).tolist())


@given(values=series_strategy, limit=st.one_of(st.none(), st.integers(1, 4)))
@SETTINGS
def test_bfill_property(spark, values, limit):
    got = [r["v"] for r in bfill(_spark_df(spark, values), "ts", ["v"], limit=limit).orderBy("ts").collect()]
    _match(got, _pd_series(values).bfill(limit=limit).tolist())


@given(values=series_strategy)
@SETTINGS
def test_interpolate_property(spark, values):
    got = [
        r["v"]
        for r in interpolate_time(_spark_df(spark, values), "ts", ["v"]).orderBy("ts").collect()
    ]
    _match(got, _pd_series(values).interpolate(method="time").tolist())


@given(
    data_offsets=st.lists(st.integers(0, 300), min_size=1, max_size=10, unique=True),
    target_offsets=st.lists(st.integers(0, 300), min_size=1, max_size=8, unique=True),
    direction=st.sampled_from(["nearest", "backward", "forward"]),
)
@SETTINGS
def test_asof_property(spark, data_offsets, target_offsets, direction):
    data_rows = [(BASE + timedelta(minutes=m), float(m)) for m in sorted(data_offsets)]
    targets = [BASE + timedelta(minutes=m) for m in sorted(target_offsets)]
    sdata = spark.createDataFrame(data_rows, "ts TIMESTAMP, value DOUBLE")
    stargets = spark.createDataFrame([(t,) for t in targets], "ts TIMESTAMP")
    got = {
        r["ts"]: r["value"]
        for r in asof_nearest(stargets, sdata, "ts", ["value"], direction=direction).collect()
    }
    exp = pd.merge_asof(
        pd.DataFrame({"ts": pd.to_datetime(targets)}),
        pd.DataFrame(data_rows, columns=["ts", "value"]),
        on="ts",
        direction=direction,
    )
    for _, row in exp.iterrows():
        g = got[row["ts"].to_pydatetime()]
        if pd.isna(row["value"]):
            assert g is None
        else:
            assert g == row["value"]


@given(series_strategy)
@SETTINGS
def test_m4_downsample_matches_pandas_extrema(spark, values):
    """M4 per-bucket first/min/max/last values match a pandas groupby
    over 3-hour buckets (values only — M4's arg-timestamp tie rule,
    earliest-min/latest-max, is pinned separately in test_resample)."""
    from time_series_loader_spark.operators.resample import m4_downsample

    df = _spark_df(spark, values)
    got = {}
    for r in m4_downsample(df, "ts", "v", "3h").collect():
        got.setdefault(r["bucket_ts"], {})[r["role"]] = r["v"]

    s = _pd_series(values)
    g = s.groupby(s.index.floor("3h"))
    exp_first, exp_last = g.first(), g.last()
    exp_min, exp_max = g.min(), g.max()
    for b in exp_first.index:
        key = b.to_pydatetime()
        if np.isnan(exp_min[b]):
            assert key not in got  # all-null bucket emits nothing
            continue
        assert got[key]["first"] == exp_first[b]
        assert got[key]["last"] == exp_last[b]
        assert got[key]["min"] == exp_min[b]
        assert got[key]["max"] == exp_max[b]


@given(
    st.lists(
        st.one_of(st.none(), st.integers(0, 50)),
        min_size=1,
        max_size=20,
    ),
    st.floats(0.05, 1.0, allow_nan=False),
)
@SETTINGS
def test_weighted_sample_is_a_nested_deterministic_filter(spark, weights, fraction):
    """Properties that hold for ANY weights/fraction: decisions are
    deterministic, null/zero-weight rows never selected, and raising the
    fraction only ADDs rows (bucket-threshold nesting)."""
    from time_series_loader_spark.operators.sampling import weighted_sample

    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id LONG, w INT")
    kept = {r["doc_id"] for r in weighted_sample(df, "doc_id", "w", fraction).collect()}
    assert kept == {
        r["doc_id"]
        for r in weighted_sample(df.repartition(3), "doc_id", "w", fraction).collect()
    }
    for i in kept:
        assert weights[i] is not None and weights[i] > 0
    if fraction <= 0.5:
        bigger = {
            r["doc_id"]
            for r in weighted_sample(df, "doc_id", "w", 2 * fraction).collect()
        }
        assert kept <= bigger


# ---- Misra-Gries heavy hitters: exact-verify mode equals the definition
# on ARBITRARY multisets (r8) -------------------------------------------

hh_strategy = st.lists(
    st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "h"]),
    min_size=1,
    max_size=120,
)


@SETTINGS
@given(keys=hh_strategy, k=st.integers(2, 6), parts=st.integers(1, 5))
def test_heavy_hitters_equals_definition(spark, keys, k, parts):
    from collections import Counter

    from time_series_loader_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame([(x,) for x in keys], ["k"]).repartition(parts)
    got = {r["k"]: r["n"] for r in heavy_hitters(df, "k", k=k).collect()}
    n = len(keys)
    want = {key: c for key, c in Counter(keys).items() if c > n / k}
    assert got == want
