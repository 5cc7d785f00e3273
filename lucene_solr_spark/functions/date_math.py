"""Solr date-math expressions (DateMathParser analog).

Reference semantics (solr/core/src/java/org/apache/solr/util/
DateMathParser.java): an anchor instant (``NOW`` or an ISO-8601 instant
followed by ``Z``) modified by a chain of operations —

- ``/UNIT``  round DOWN to the unit (DateMathParser.round, :216-239)
- ``+N UNIT`` / ``-N UNIT``  calendar-aware add (DateMathParser.add, :196-214)

Units per the CALENDAR_UNITS table (:117-141): YEAR(S), MONTH(S), DAY(S)/
DATE, HOUR(S), MINUTE(S), SECOND(S), MILLI(S)/MILLISECOND(S).  Everything is
UTC (Solr's math TimeZone defaults to UTC, :158-166).

The parser is pure Python and returns epoch milliseconds, so the SAME
integer literal lands in the Spark plan and the DuckDB oracle — date math
never becomes a cross-engine float/timezone hazard.
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timezone

_UNIT_ALIASES = {
    "YEAR": "YEAR", "YEARS": "YEAR",
    "MONTH": "MONTH", "MONTHS": "MONTH",
    "DAY": "DAY", "DAYS": "DAY", "DATE": "DAY",
    "HOUR": "HOUR", "HOURS": "HOUR",
    "MINUTE": "MINUTE", "MINUTES": "MINUTE",
    "SECOND": "SECOND", "SECONDS": "SECOND",
    "MILLI": "MILLI", "MILLIS": "MILLI",
    "MILLISECOND": "MILLI", "MILLISECONDS": "MILLI",
}

_OP_RE = re.compile(r"([+\-/])(\d*)([A-Z]+)")

_UNIT_MS = {
    "DAY": 86_400_000,
    "HOUR": 3_600_000,
    "MINUTE": 60_000,
    "SECOND": 1_000,
    "MILLI": 1,
}


def _add_months(dt: datetime, n: int) -> datetime:
    """Calendar-aware month add with day clamping (java.util.Calendar.add
    semantics: Jan 31 + 1 MONTH = Feb 28/29)."""
    total = dt.year * 12 + (dt.month - 1) + n
    y, m = divmod(total, 12)
    m += 1
    day = min(dt.day, calendar.monthrange(y, m)[1])
    return dt.replace(year=y, month=m, day=day)


def _round_down(dt: datetime, unit: str) -> datetime:
    if unit == "YEAR":
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "MONTH":
        return dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "DAY":
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "HOUR":
        return dt.replace(minute=0, second=0, microsecond=0)
    if unit == "MINUTE":
        return dt.replace(second=0, microsecond=0)
    if unit == "SECOND":
        return dt.replace(microsecond=0)
    if unit == "MILLI":
        return dt.replace(microsecond=(dt.microsecond // 1000) * 1000)
    raise ValueError(f"unknown unit {unit!r}")


def parse_date_math(expr: str, now_epoch_ms: int) -> int:
    """Evaluate a Solr date-math string to UTC epoch milliseconds.

    ``NOW/DAY-30DAYS``, ``NOW+2HOURS``, ``2026-01-01T00:00:00Z/MONTH+7DAYS``…
    ``now_epoch_ms`` pins NOW (like Solr's per-request NOW= param) so
    evaluation is deterministic.
    """
    expr = expr.strip()
    if expr.startswith("NOW"):
        anchor_ms, rest = now_epoch_ms, expr[3:]
    else:
        m = re.match(r"(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d{1,3})?)Z", expr)
        if not m:
            raise ValueError(f"date-math must start with NOW or ISO instant: {expr!r}")
        iso = m.group(1)
        fmt = "%Y-%m-%dT%H:%M:%S.%f" if "." in iso else "%Y-%m-%dT%H:%M:%S"
        dt0 = datetime.strptime(iso, fmt).replace(tzinfo=timezone.utc)
        anchor_ms, rest = int(dt0.timestamp() * 1000), expr[m.end():]

    # anchor exactly from int ms (a float fromtimestamp would wobble)
    dt = datetime.fromtimestamp(anchor_ms // 1000, tz=timezone.utc).replace(
        microsecond=(anchor_ms % 1000) * 1000
    )
    pos = 0
    for m in _OP_RE.finditer(rest):
        if m.start() != pos:
            raise ValueError(f"bad date-math at {rest[pos:]!r}")
        pos = m.end()
        op, num, unit_raw = m.groups()
        unit = _UNIT_ALIASES.get(unit_raw)
        if unit is None:
            raise ValueError(f"unknown date-math unit {unit_raw!r}")
        if op == "/":
            if num:
                raise ValueError("rounding takes no number")
            dt = _round_down(dt, unit)
            continue
        n = int(num or "1") * (1 if op == "+" else -1)
        if unit == "YEAR":
            dt = _add_months(dt, 12 * n)
        elif unit == "MONTH":
            dt = _add_months(dt, n)
        else:
            ms = int(dt.timestamp() * 1000) + n * _UNIT_MS[unit]
            dt = datetime.fromtimestamp(ms // 1000, tz=timezone.utc).replace(
                microsecond=(ms % 1000) * 1000
            )
    if pos != len(rest):
        raise ValueError(f"bad date-math tail {rest[pos:]!r}")
    return int(dt.timestamp()) * 1000 + dt.microsecond // 1000
