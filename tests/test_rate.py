"""Reset-aware counter increase/rate: hand cases, reset handling,
keyed/unkeyed parity against a python reference."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from time_series_loader_spark.operators.rate import counter_increase

T0 = dt.datetime(2024, 1, 1)


def _df(spark, points, key=None):
    rows = [
        (key, T0 + dt.timedelta(seconds=s), None if v is None else float(v))
        for s, v in points
    ]
    df = spark.createDataFrame(rows, "host STRING, ts TIMESTAMP, value DOUBLE")
    return df if key is not None else df.drop("host")


def _py_increase(points, step_s):
    pts = [(s, v) for s, v in points if v is not None]
    out = {}
    for (s0, v0), (s1, v1) in zip(pts, pts[1:]):
        c = v1 if v1 < v0 else v1 - v0
        b = int((T0.timestamp() + s1) // step_s)
        inc, nr = out.get(b, (0.0, 0))
        out[b] = (inc + c, nr + (1 if v1 < v0 else 0))
    return {dt.datetime.utcfromtimestamp(b * step_s): x for b, x in out.items()}


def _collect(df):
    return {
        r["ts"].replace(tzinfo=None): (r["increase"], r["n_resets"], r["rate"])
        for r in df.collect()
    }


def test_monotone_counter(spark):
    pts = [(0, 100.0), (20, 130.0), (40, 190.0), (70, 220.0)]
    got = _collect(counter_increase(_df(spark, pts, key="h"), "ts", "value", 60,
                                    group_cols=["host"]))
    assert got[T0][0] == pytest.approx(90.0)       # 30 + 60 in minute 0
    assert got[T0][2] == pytest.approx(90.0 / 60)  # rate per second
    assert got[T0 + dt.timedelta(minutes=1)][0] == pytest.approx(30.0)
    assert all(nr == 0 for _, nr, _ in got.values())


def test_reset_contributes_post_restart_value(spark):
    # counter restarts between t=20 (500) and t=40 (30): contribution 30
    pts = [(0, 400.0), (20, 500.0), (40, 30.0), (50, 45.0)]
    got = _collect(counter_increase(_df(spark, pts, key="h"), "ts", "value", 60,
                                    group_cols=["host"]))
    assert got[T0][0] == pytest.approx(100.0 + 30.0 + 15.0)
    assert got[T0][1] == 1  # one reset counted


def test_nulls_skipped_delta_spans(spark):
    pts = [(0, 10.0), (20, None), (40, 25.0)]
    got = _collect(counter_increase(_df(spark, pts, key="h"), "ts", "value", 60,
                                    group_cols=["host"]))
    assert got[T0][0] == pytest.approx(15.0)


@pytest.mark.parametrize("keyed", [True, False])
def test_differential_vs_python(spark, keyed):
    rng = np.random.RandomState(5)
    t, v, pts = 0.0, 0.0, []
    for _ in range(500):
        t += float(rng.exponential(20.0))
        v += float(rng.exponential(8.0))
        if rng.rand() < 0.02:
            v = float(rng.rand())  # reset
        pts.append((round(t, 3), round(v, 2)))
    step = 120
    expect = _py_increase(pts, step)
    out = counter_increase(
        _df(spark, pts, key="h" if keyed else None), "ts", "value", step,
        group_cols=["host"] if keyed else (),
        num_buckets=None if keyed else 6,
    )
    got = _collect(out)
    assert set(got) == set(expect)
    for b, (inc, nr) in expect.items():
        assert got[b][0] == pytest.approx(inc, rel=1e-9)
        assert got[b][1] == nr


def test_series_independent(spark):
    a = _df(spark, [(0, 1.0), (30, 5.0)], key="a")
    b = _df(spark, [(0, 100.0), (30, 2.0)], key="b")  # reset in b
    out = counter_increase(a.union(b), "ts", "value", 60, group_cols=["host"])
    got = {(r["host"]): (r["increase"], r["n_resets"]) for r in out.collect()}
    assert got["a"] == (pytest.approx(4.0), 0)
    assert got["b"] == (pytest.approx(2.0), 1)


def test_decimal_first_quantization(spark):
    """Round-6 hardening: readings are cast to DECIMAL(27,6) BEFORE the
    delta, so sub-µunit movement contributes exactly 0 — whereas the
    broken order (subtract doubles, then cast) would round 8e-7 up to
    1e-6. Divergence case: round(v-pv, 6) != round(v,6) - round(pv,6)."""
    pts = [(0, 0.9999996), (30, 1.0000004)]
    out = counter_increase(_df(spark, pts, key="h"), "ts", "value", 60,
                           group_cols=["host"])
    got = out.collect()
    assert len(got) == 1
    # cast-then-subtract: 1.000000 - 1.000000 = 0; subtract-then-cast
    # would give round(8e-7, 6) = 1e-6
    assert got[0]["increase"] == 0.0
    assert got[0]["n_resets"] == 0

    # reset DETECTION also happens on quantized values: a backward move
    # entirely below the 1e-6 grid is not a reset
    pts2 = [(0, 2.0000004), (30, 2.0000001)]
    got2 = counter_increase(_df(spark, pts2, key="h"), "ts", "value", 60,
                            group_cols=["host"]).collect()
    assert got2[0]["n_resets"] == 0
    assert got2[0]["increase"] == 0.0

    # and a genuine 1-µunit step survives exactly
    pts3 = [(0, 1.0), (30, 1.000001)]
    got3 = counter_increase(_df(spark, pts3, key="h"), "ts", "value", 60,
                            group_cols=["host"]).collect()
    assert got3[0]["increase"] == pytest.approx(1e-6, abs=0)
