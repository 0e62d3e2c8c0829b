"""Human frequency-string parsing.

The reference accepts pandas offset aliases like ``"15min"``, ``"1H"``,
``"1D"`` (e.g. reference ``load_file.py:2077,2081,2286``). We parse the same
family into integer seconds — the engine's resample/grid operators bin on
epoch-second arithmetic, which is exact for second-multiple frequencies and
keeps binning inside whole-stage codegen (no Python in the hot path).
"""

from __future__ import annotations

import re
from datetime import timedelta

_UNIT_SECONDS = {
    "w": 7 * 86400,
    "week": 7 * 86400,
    "weeks": 7 * 86400,
    "d": 86400,
    "day": 86400,
    "days": 86400,
    "h": 3600,
    "hr": 3600,
    "hour": 3600,
    "hours": 3600,
    "t": 60,
    "m": 60,
    "min": 60,
    "minute": 60,
    "minutes": 60,
    "s": 1,
    "sec": 1,
    "second": 1,
    "seconds": 1,
}

_FREQ_RE = re.compile(r"^\s*(\d*)\s*([a-zA-Z]+)\s*$")

# pandas calendar aliases have no fixed second length; lowercasing them would
# silently misparse 'M' (month) as minutes — reject them explicitly instead.
_CALENDAR_UNITS = {"M", "MS", "ME", "Y", "YS", "YE", "A", "AS", "Q", "QS", "QE"}
_CALENDAR_WORDS = {"month", "months", "year", "years", "quarter", "quarters"}


def freq_to_seconds(freq: str | int | float | timedelta) -> int:
    """Parse ``"15min" | "1H" | "3600s" | timedelta | int-seconds`` → seconds.

    Raises ValueError for unknown units or non-positive results (matching the
    reference's ValueError on bad resample inputs, ``load_file.py:2286``).
    """
    if isinstance(freq, timedelta):
        secs = int(freq.total_seconds())
    elif isinstance(freq, (int, float)):
        secs = int(freq)
    else:
        m = _FREQ_RE.match(str(freq))
        if not m:
            raise ValueError(f"unparseable frequency: {freq!r}")
        n = int(m.group(1) or "1")
        if m.group(2) in _CALENDAR_UNITS or m.group(2).lower() in _CALENDAR_WORDS:
            raise ValueError(
                f"calendar frequencies unsupported: {freq!r} (months/quarters/"
                "years have no fixed second length; use day/hour multiples)"
            )
        unit = m.group(2).lower()
        if unit not in _UNIT_SECONDS:
            raise ValueError(f"unknown frequency unit {m.group(2)!r} in {freq!r}")
        secs = n * _UNIT_SECONDS[unit]
    if secs <= 0:
        raise ValueError(f"frequency must be positive, got {freq!r}")
    return secs
