"""Funnel + cohort retention (operators/behavior.py)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from time_series_loader_spark.operators.behavior import (
    cohort_retention,
    funnel_steps,
)


def _ts(day, hour=0):
    return datetime(2024, 1, day, hour)


EVENTS = [
    # user 1: full ordered funnel
    (1, "signup", _ts(1)),
    (1, "view", _ts(2)),
    (1, "purchase", _ts(3)),
    # user 2: purchase BEFORE signup — must not count past step 1
    (2, "purchase", _ts(1)),
    (2, "signup", _ts(2)),
    # user 3: signup + view only
    (3, "signup", _ts(1)),
    (3, "view", _ts(1, 12)),
    # user 4: view/purchase but never signed up — counts nowhere
    (4, "view", _ts(1)),
    (4, "purchase", _ts(2)),
    # user 5: signup then simultaneous view (NOT strictly after) — step 2 no
    (5, "signup", _ts(4)),
    (5, "view", _ts(4)),
    # user 6: repeated steps; first qualifying occurrences count
    (6, "signup", _ts(1)),
    (6, "signup", _ts(5)),
    (6, "view", _ts(2)),
    (6, "purchase", _ts(2, 12)),
]


@pytest.fixture(scope="module")
def events_df(spark):
    return spark.createDataFrame(EVENTS, ["user_id", "event_type", "ts"])


def test_funnel_counts(events_df):
    rows = {
        r["step"]: (r["event_type"], r["n_users"])
        for r in funnel_steps(
            events_df, "ts", "user_id", "event_type", ["signup", "view", "purchase"]
        ).collect()
    }
    # signed up: 1,2,3,5,6 ; viewed strictly after: 1,3,6 ; purchased after that: 1,6
    assert rows == {
        1: ("signup", 5),
        2: ("view", 3),
        3: ("purchase", 2),
    }


def test_funnel_monotone_and_order_matters(events_df):
    rows = funnel_steps(
        events_df, "ts", "user_id", "event_type", ["view", "signup"]
    ).collect()
    by_step = {r["step"]: r["n_users"] for r in rows}
    # viewed: 1,3,4,5,6 ; signed up strictly after first view: 6 (day5 signup)
    assert by_step == {1: 5, 2: 1}
    with pytest.raises(ValueError, match="two steps"):
        funnel_steps(events_df, "ts", "user_id", "event_type", ["signup"])
    with pytest.raises(ValueError, match="distinct"):
        funnel_steps(events_df, "ts", "user_id", "event_type", ["a", "a"])


def test_cohort_retention_cells(spark):
    # two cohorts a week apart; week = epoch-µs div, so use UTC-round dates
    ev = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 4)),   # thursdays: epoch weeks start thursday
            (1, datetime(2024, 1, 11)),  # +1 week
            (1, datetime(2024, 1, 25)),  # +3 weeks
            (2, datetime(2024, 1, 4)),
            (3, datetime(2024, 1, 11)),  # later cohort
            (3, datetime(2024, 1, 12)),  # same week — distinct'd
        ],
        ["user_id", "ts"],
    )
    cells = {
        (r["cohort_week"] , r["week_offset"]): r["n_users"]
        for r in cohort_retention(ev, "ts", "user_id").collect()
    }
    weeks = sorted({c for c, _ in cells})
    w0, w1 = weeks[0], weeks[1]
    assert w1 == w0 + 1
    assert cells == {
        (w0, 0): 2,  # users 1, 2
        (w0, 1): 1,  # user 1
        (w0, 3): 1,  # user 1
        (w1, 0): 1,  # user 3 (two events, one week)
    }
    capped = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in cohort_retention(ev, "ts", "user_id", max_offset=1).collect()
    }
    assert (w0, 3) not in capped and (w0, 1) in capped


def test_partition_invariance(events_df):
    a = sorted(
        map(
            tuple,
            funnel_steps(
                events_df, "ts", "user_id", "event_type",
                ["signup", "view", "purchase"],
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            funnel_steps(
                events_df.repartition(7), "ts", "user_id", "event_type",
                ["signup", "view", "purchase"],
            ).collect(),
        )
    )
    assert a == b


def test_cohort_retention_floors_negative_epochs(spark):
    """ADVICE r7 (low): pre-1970 timestamps (negative epoch-µs) must
    cohort by FLOOR division like the DuckDB oracle's `//`, not Spark's
    trunc-toward-zero `div` — a 1969 event belongs to week -1, not 0."""
    from datetime import datetime, timezone

    from time_series_loader_spark.operators.behavior import cohort_retention

    rows = [
        (1, datetime(1969, 12, 31, 12, tzinfo=timezone.utc)),  # week -1
        (1, datetime(1970, 1, 2, tzinfo=timezone.utc)),        # week 0
        (2, datetime(1970, 1, 5, tzinfo=timezone.utc)),        # week 0
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in cohort_retention(df, "ts", "user_id").collect()
    }
    assert got == {(-1, 0): 1, (-1, 1): 1, (0, 0): 1}
