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
