"""Date parsing waterfall + XSD literal typing.

Behavioral parity targets:
- ``date_parse``: the 12-pattern strptime waterfall with
  interval expansion to end-of-period — reference
  ``Utils/activity.py:82-169`` (duplicated ``Mods/modsBib.py:134-221``).
  Returns ``(start_iso, ok, end_iso)``; on failure the original string
  round-trips with ``ok=False``.
- ``xsd_datatype_for``: literal typing by lexical length — 10 →
  ``xsd:date``, 7 → ``xsd:gYearMonth``, 4 → ``xsd:gYear``, 19 →
  ``xsd:dateTime``, else untyped — reference ``Utils/event.py:90-110``
  and ``Utils/activity.py:40-73``. The gYear/gYearMonth literals keep
  their lexical form un-normalized (rdflib issues 747/806 quirk): we
  compare triples on lexical form + datatype, never parsed values.
"""

from __future__ import annotations

import datetime as _dt

# (strptime pattern, period) — tried in order; period drives the
# end-of-interval expansion: day→+1d-1s, month→next month-1s,
# year→next year-1s.
_WATERFALL: list[tuple[str, str]] = [
    ("%Y-%m-%d", "day"),
    ("%Y-%m-%d-", "day"),
    ("%Y--", "year"),
    ("%Y-", "year"),
    ("%Y", "year"),
    ("%Y-%m-", "month"),
    ("%Y-%m", "month"),
    ("%B %Y", "month"),
    ("%d %B %Y", "day"),
    ("%Y-%m--", "month"),
    ("%b %Y", "month"),
    ("%d %b %Y", "day"),
]


def _next_month(dt: _dt.datetime) -> _dt.datetime:
    if dt.month == 12:
        return dt.replace(year=dt.year + 1, month=1)
    return dt.replace(month=dt.month + 1)


import re as _re

# fast-path shape dispatch: one cheap regex match replaces up to 12
# strptime attempts (~50% of templating CPU in profiling); the legacy
# waterfall below remains the fallback, so semantics are identical.
_NUM_DAY = _re.compile(r"^(\d{4})-(\d{2})-(\d{2})-?$")
_NUM_MONTH = _re.compile(r"^(\d{4})-(\d{2})-{0,2}$")
_NUM_YEAR = _re.compile(r"^(\d{4})-{0,2}$")
_TXT_DAY = _re.compile(r"^(\d{1,2}) ([A-Za-z]+) (\d{4})$")
_TXT_MONTH = _re.compile(r"^([A-Za-z]+) (\d{4})$")

_MONTHS: dict[str, int] = {}
for _i in range(1, 13):
    _name = _dt.date(2000, _i, 1).strftime("%B")
    _MONTHS[_name.lower()] = _i
    _MONTHS[_name[:3].lower()] = _i


def _expanded(y: int, m: int | None, d: int | None
              ) -> tuple[str, bool, str]:
    if d is not None:
        dt = _dt.datetime(y, m, d)
        end = dt + _dt.timedelta(days=1, seconds=-1)
    elif m is not None:
        dt = _dt.datetime(y, m, 1)
        end = _next_month(dt) - _dt.timedelta(seconds=1)
    else:
        dt = _dt.datetime(y, 1, 1)
        end = dt.replace(year=y + 1) - _dt.timedelta(seconds=1)
    return dt.isoformat(), True, end.isoformat()


def date_parse(date_string: str) -> tuple[str, bool, str]:
    """12-pattern waterfall → ``(start_iso, ok, end_iso)``."""
    s = date_string.strip()
    try:
        m = _NUM_DAY.match(s)
        if m:
            return _expanded(int(m.group(1)), int(m.group(2)),
                             int(m.group(3)))
        m = _NUM_MONTH.match(s)
        if m:
            return _expanded(int(m.group(1)), int(m.group(2)), None)
        m = _NUM_YEAR.match(s)
        if m:
            return _expanded(int(m.group(1)), None, None)
        m = _TXT_MONTH.match(s)
        if m:
            mon = _MONTHS.get(m.group(1).lower())
            if mon:
                return _expanded(int(m.group(2)), mon, None)
        m = _TXT_DAY.match(s)
        if m:
            mon = _MONTHS.get(m.group(2).lower())
            if mon:
                return _expanded(int(m.group(3)), mon, int(m.group(1)))
    except ValueError:
        return date_string, False, date_string  # shape ok, value invalid
    if not any(c.isdigit() for c in s):
        return date_string, False, date_string  # no strptime pattern can hit
    for pattern, period in _WATERFALL:  # parity fallback (rare shapes)
        try:
            dt = _dt.datetime.strptime(s, pattern)
        except ValueError:
            continue
        if period == "day":
            end = dt + _dt.timedelta(days=1, seconds=-1)
        elif period == "month":
            end = _next_month(dt) - _dt.timedelta(seconds=1)
        else:  # year
            end = dt.replace(year=dt.year + 1) - _dt.timedelta(seconds=1)
        return dt.isoformat(), True, end.isoformat()
    return date_string, False, date_string


def xsd_datatype_for(date: str) -> tuple[str, str]:
    """Length-typed literal rule → ``(lexical, datatype_curie)``.

    Trailing ``-`` is stripped first (reference strips before typing);
    untyped values return ``("", ...)`` datatype.
    """
    if date and date[-1] == "-":
        date = date.strip("-")
    n = len(date)
    if n == 10:
        return date, "xsd:date"
    if n == 7:
        return date, "xsd:gYearMonth"
    if n == 4:
        return date, "xsd:gYear"
    if n == 19:
        return date, "xsd:dateTime"
    return date, ""


def format_date_parts(date: str) -> tuple[str, str, str]:
    """Full helper for templating: ``(lexical, obj_kind, datatype)``."""
    lex, dt = xsd_datatype_for(date)
    return lex, "literal", dt


# SEM timestamp-predicate choice (reference Utils/event.py:176-191):
# exact punctive date → sem:hasTimeStamp; certainty BY →
# hasLatestBeginTimeStamp; AFTER → hasEarliestBeginTimeStamp;
# ranges → begin/end pairs.
CERTAINTY_MAP = {
    "CERT": "hasTimeStamp",
    "BY": "hasLatestBeginTimeStamp",
    "AFTER": "hasEarliestBeginTimeStamp",
    "ROUGHLYDATED": "hasTime",
    "": "hasTimeStamp",
}


def timestamp_predicate(certainty: str) -> str:
    """Map a certainty marker to the SEM timestamp predicate name."""
    return CERTAINTY_MAP.get(certainty, "hasTimeStamp")
