"""README's embedded counts kept going stale within their own round
(VERDICT r10 #3: 571→572; VERDICT r11 #2: 578→592). Per r11 directive
#3, every exact count README claims is now asserted against collected
reality — the `test_oracle_side_types` pattern applied to prose. A
failing run here means: fix README, not the test.

The test-count claim must carry the marker phrase
"N tests (mechanically asserted" so this file can find it; removing
the marker (i.e. reverting to an unasserted count) also fails."""

import pathlib
import re
import subprocess
import sys

import __spark_entry__ as entrymod

REPO = pathlib.Path(__file__).resolve().parent.parent
README = (REPO / "README.md").read_text()


def _collected_count() -> int:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "--collect-only", "-q"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    m = re.search(r"(\d+) tests? collected", out.stdout)
    assert m, f"could not parse collect-only output:\n{out.stdout[-500:]}"
    return int(m.group(1))


def test_readme_test_count_matches_collected_reality():
    m = re.search(r"(\d+) tests\s*\(mechanically asserted", README)
    assert m, (
        "README must state the suite size with the marker phrase "
        "'N tests (mechanically asserted' — an unmarked count cannot "
        "be kept honest"
    )
    claimed = int(m.group(1))
    actual = _collected_count()
    assert claimed == actual, (
        f"README claims {claimed} tests; pytest collects {actual} — "
        f"update the README number"
    )


def test_readme_slot_count_matches_gate_surface():
    # every "EXACTLY 50 slots" / "50/50" style claim rests on the gate
    # surface actually being 50 queries, all oracled
    qs = entrymod.queries()
    assert "EXACTLY 50 slots" in README
    assert len(qs) == 50, f"gate surface is {len(qs)} queries, README says 50"
