"""The driver records only the last ``bench.TAIL_BUDGET`` chars of
bench.py's stdout (BENCH_r11 measured: exactly 2000). r11's single fat
JSON line (50 queries + 21 sections + calibration) outgrew that window
and the headline ``value`` was truncated out of the round record
(VERDICT r11 what's-wrong #1). The contract now: the FINAL stdout line
is a compact headline (value + per-query, 2dp) guaranteed to fit with
margin; sections/calibration live in the bench_report.json artifact.

These tests pin that contract against the CURRENT query set, so a
grown slot roster fails here before it fails in a round record."""

import json

import bench
import __spark_entry__ as entrymod


def _fake_timings():
    # worst-case widths: real slot names, 4-digit-second values with the
    # 2-decimal rounding the compact line applies
    return {name: 123.456 for name in entrymod.queries()}


def test_compact_line_fits_tail_budget_with_margin():
    line = bench.compact_headline_line(999.999, _fake_timings(), 0.1)
    assert len(line) <= bench.TAIL_BUDGET - 300, (
        f"final bench line is {len(line)} chars; the driver tail window "
        f"is {bench.TAIL_BUDGET} — shrink the line, not the margin"
    )


def test_compact_line_parses_and_keeps_headline_fields():
    timings = _fake_timings()
    line = bench.compact_headline_line(55.57, timings, 0.1)
    rec = json.loads(line)
    assert rec["metric"] == "headline_queries_total_wall"
    assert rec["value"] == 55.57
    assert rec["unit"] == "sec"
    assert rec["sf"] == 0.1
    assert set(rec["queries"]) == set(timings)
    # 2-decimal rounding, not full precision — that is the compactness
    assert all(v == 123.46 for v in rec["queries"].values())


def test_compact_line_single_line_no_newline():
    line = bench.compact_headline_line(1.0, _fake_timings(), 0.01)
    assert "\n" not in line


def test_compact_line_degrades_instead_of_overflowing():
    # pathological roster: 300 long-named queries must still yield a
    # parseable line under budget (per-query detail shed to the file)
    timings = {f"very_long_query_name_number_{i:04d}": 1.234 for i in range(300)}
    line = bench.compact_headline_line(370.2, timings, 0.1)
    assert len(line) <= bench.TAIL_BUDGET - 300
    rec = json.loads(line)
    assert rec["value"] == 370.2
