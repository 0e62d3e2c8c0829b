from datetime import timedelta

import pytest

from time_series_loader_spark.functions.frequency import freq_to_seconds


def test_pandas_style_aliases():
    assert freq_to_seconds("15min") == 900
    assert freq_to_seconds("1H") == 3600
    assert freq_to_seconds("1h") == 3600
    assert freq_to_seconds("1D") == 86400
    assert freq_to_seconds("3600s") == 3600
    assert freq_to_seconds("2T") == 120
    assert freq_to_seconds("min") == 60


def test_timedelta_and_numeric():
    assert freq_to_seconds(timedelta(minutes=15)) == 900
    assert freq_to_seconds(60) == 60
    assert freq_to_seconds(60.0) == 60


@pytest.mark.parametrize("bad", ["", "abc123", "15parsecs", 0, -5])
def test_invalid(bad):
    with pytest.raises(ValueError):
        freq_to_seconds(bad)


@pytest.mark.parametrize("cal", ["M", "1M", "MS", "3M", "Y", "2Q", "month", "1year"])
def test_calendar_frequencies_rejected(cal):
    # pandas 'M' means month-end; lowercasing it to minutes would be a
    # silent ~43800x misparse for ported configs — must raise instead.
    with pytest.raises(ValueError, match="calendar"):
        freq_to_seconds(cal)


def test_lowercase_m_still_minutes():
    assert freq_to_seconds("5m") == 300
    assert freq_to_seconds("m") == 60
