"""Plan-build smoke gate (VERDICT r9 directive #3): constructing every
``queries()`` DataFrame at sf0.001 — WITHOUT executing it — catches
analysis-time and decorator-time failures (unresolved pandas_udf type
hints, missing columns, bad casts) in seconds, the class of error that
broke round 9's final commit. Named test_aa_* so an alphabetical pytest
run hits it first; it is also the cheapest possible pre-commit gate:

    python -m pytest tests/test_aa_plan_smoke.py -q
"""

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"

_QUERIES = sorted(entry.queries())


@pytest.mark.parametrize("name", _QUERIES)
def test_plan_builds(spark, name):
    """Building the plan forces analysis (schema resolution, UDF
    registration) but moves no data; .schema triggers analysis on the
    lazy plan without an action."""
    df = entry.queries()[name](spark, SF)
    assert len(df.schema.fields) > 0, name


def test_every_query_has_an_oracle_or_documented_waiver():
    """Every queries() key either has an oracle_sql() entry (full
    hash-checked differential) or is in the known rows-only set
    (non-SQL-expressible streaming/stateful ops the driver checks
    weakly). A new key silently missing its oracle is a gate hole."""
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert o <= q, f"oracle keys without queries: {sorted(o - q)}"
    rows_only = q - o
    # keep this list explicit: additions must be deliberate
    assert rows_only <= set(entry.ROWS_ONLY_QUERIES), (
        f"queries missing oracles and not waived: "
        f"{sorted(rows_only - set(entry.ROWS_ONLY_QUERIES))}"
    )
