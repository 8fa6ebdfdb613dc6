"""Pandas offset-alias ↔ Spark interval translation.

The reference records resample frequencies as pandas offset aliases
("5min", "2H", "D", ...) and has already been bitten by the
missing-"1"-prefix quirk (reference CHANGELOG.md:46-48,
types.py:440-444).  This module is the single well-tested place where
those strings are parsed and converted to Spark interval strings and
to integer durations.
"""

from __future__ import annotations

import re

# pandas alias (lowered) -> (spark unit name, seconds per unit; None = calendar unit)
_UNIT_MAP: dict[str, tuple[str, float | None]] = {
    "ns": ("nanosecond", 1e-9),
    "us": ("microsecond", 1e-6),
    "ms": ("millisecond", 1e-3),
    "l": ("millisecond", 1e-3),
    "s": ("second", 1.0),
    "sec": ("second", 1.0),
    "min": ("minute", 60.0),
    "t": ("minute", 60.0),
    "h": ("hour", 3600.0),
    "hr": ("hour", 3600.0),
    "d": ("day", 86400.0),
    "day": ("day", 86400.0),
    "w": ("week", 7 * 86400.0),
    # calendar-length units: no fixed number of seconds
    "m": ("month", None),
    "me": ("month", None),
    "ms_month": ("month", None),  # not reachable via parse; guard entry
    "q": ("quarter", None),
    "y": ("year", None),
    "a": ("year", None),
}

_FREQ_RE = re.compile(r"^\s*(?P<n>\d*)\s*(?P<unit>[a-zA-Z]+)\s*$")


class FrequencyError(ValueError):
    pass


def parse_freq(freq: str) -> tuple[int, str]:
    """Parse a pandas offset alias into ``(n, spark_unit)``.

    ``"5min"`` -> ``(5, "minute")``; bare units get the implicit 1
    (``"D"`` -> ``(1, "day")``).  Case-sensitive pandas subtleties:
    upper-case ``M`` is month, lower-case ``m``/``min`` is minute;
    ``MS`` (month-start) maps to month.
    """
    m = _FREQ_RE.match(freq)
    if not m:
        raise FrequencyError(f"Cannot parse frequency alias {freq!r}")
    n = int(m.group("n") or "1")
    unit = m.group("unit")

    # case-sensitive disambiguation before lowering
    if unit == "M" or unit == "ME" or unit == "MS":
        return n, "month"
    if unit in ("m", "min", "T", "t"):
        return n, "minute"
    if unit in ("MIN",):
        return n, "minute"

    key = unit.lower()
    if key not in _UNIT_MAP:
        raise FrequencyError(f"Unknown frequency unit {unit!r} in {freq!r}")
    return n, _UNIT_MAP[key][0]


def to_spark_interval(freq: str) -> str:
    """``"5min"`` -> ``"5 minutes"`` (usable in F.window / INTERVAL)."""
    n, unit = parse_freq(freq)
    plural = unit if n == 1 else unit + "s"
    return f"{n} {plural}"


def to_seconds(freq: str) -> float:
    """Fixed-length duration in seconds; raises for calendar units."""
    n, unit = parse_freq(freq)
    per = {
        "nanosecond": 1e-9,
        "microsecond": 1e-6,
        "millisecond": 1e-3,
        "second": 1.0,
        "minute": 60.0,
        "hour": 3600.0,
        "day": 86400.0,
        "week": 7 * 86400.0,
    }.get(unit)
    if per is None:
        raise FrequencyError(
            f"Frequency {freq!r} is calendar-based ({unit}); "
            "no fixed second length"
        )
    return n * per


def normalize_pandas_freq(freq: str) -> str:
    """``"min"`` -> ``"1min"`` — the reference's plot-shift quirk fix
    (types.py:440-444): pandas needs the explicit count prefix when a
    frequency string is multiplied."""
    m = _FREQ_RE.match(freq)
    if not m:
        raise FrequencyError(f"Cannot parse frequency alias {freq!r}")
    n = m.group("n") or "1"
    return f"{n}{m.group('unit')}"
