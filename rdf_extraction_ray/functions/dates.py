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


def date_parse(date_string: str) -> tuple[str, bool, str]:
    """12-pattern waterfall → ``(start_iso, ok, end_iso)``."""
    s = date_string.strip()
    for pattern, period in _WATERFALL:
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
