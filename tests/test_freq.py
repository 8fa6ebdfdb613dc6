"""Frequency translator (SURVEY §7.3 risk register)."""

import pytest

from meteaudata_spark.functions.freq import (
    FrequencyError,
    normalize_pandas_freq,
    parse_freq,
    to_seconds,
    to_spark_interval,
)


@pytest.mark.parametrize(
    "alias,expected",
    [
        ("5min", (5, "minute")),
        ("min", (1, "minute")),
        ("T", (1, "minute")),
        ("2H", (2, "hour")),
        ("2h", (2, "hour")),
        ("D", (1, "day")),
        ("1D", (1, "day")),
        ("30s", (30, "second")),
        ("500ms", (500, "millisecond")),
        ("3W", (3, "week")),
        ("M", (1, "month")),
        ("ME", (1, "month")),
        ("MS", (1, "month")),
        ("2Q", (2, "quarter")),
        ("Y", (1, "year")),
    ],
)
def test_parse(alias, expected):
    assert parse_freq(alias) == expected


def test_case_sensitivity():
    # upper M is month, lower m/min is minute — the pandas trap
    assert parse_freq("M") == (1, "month")
    assert parse_freq("m") == (1, "minute")


def test_interval_strings():
    assert to_spark_interval("5min") == "5 minutes"
    assert to_spark_interval("1D") == "1 day"
    assert to_spark_interval("2H") == "2 hours"


def test_seconds():
    assert to_seconds("5min") == 300.0
    assert to_seconds("1D") == 86400.0
    with pytest.raises(FrequencyError):
        to_seconds("M")  # calendar unit has no fixed length


def test_normalize():
    # the "1"-prefix quirk (reference CHANGELOG.md:46-48)
    assert normalize_pandas_freq("min") == "1min"
    assert normalize_pandas_freq("5min") == "5min"


def test_garbage():
    with pytest.raises(FrequencyError):
        parse_freq("5 parsecs")
    with pytest.raises(FrequencyError):
        parse_freq("")
