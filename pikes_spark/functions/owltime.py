"""TimeML -> OWL-Time structures (D1).

Port of the reference's pikes-rdf util/OWLTime.java semantics:
  Interval.parseTimex (:82-293)  — dates/times incl. centuries, decades,
      seasons, weeks, weekends -> interval with begin/end DateTimes
  DateTime.create (:294-360)     — derives week-of-year and day-of-week
      (Monday-first, minimal-days-in-first-week=1, like the reference's
      GregorianCalendar configuration)
  Duration.parseTimex (:562-625) — P..Y..M..W..DT..H..M..S durations
  toRDF/toIRI (:252-292,420-478,676-700) — IRI naming (':' -> '.',
      '_desc' suffix) and emitted triples

Triples are returned as (subject, predicate, object, is_literal,
datatype) rows in the owltime namespace
http://www.newsreader-project.eu/time/ (the reference's default,
RDFGenerator.java:146) with the OWL-Time vocabulary at
http://www.w3.org/TR/owl-time# (vocab/OWLTIME.java:12).
"""

from __future__ import annotations

import datetime as _dt
import re
from dataclasses import dataclass
from typing import List, Optional, Tuple

OWLTIME_NS = "http://www.w3.org/TR/owl-time#"
DEFAULT_TIME_NS = "http://www.newsreader-project.eu/time/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
_XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"

_DATE_TIME_PATTERN = re.compile(
    r"(?:PRESENT_REF|PAST_REF|FUTURE_REF|[0-9X]{4}"
    r"(?:-(?:[0-9X]{2}|W[0-9X]{2}|SP|SU|FA|WI)(?:-(?:[0-9X]{2}|WE))?)?)?"
    r"T?(?:MO|MI|AF|EV|NI|PM|DT|[0-9X]{2}(?::[0-9X]{2}(?::[0-9X]{2})?)?)?")

_DURATION_PATTERN = re.compile(
    r"P(?:[0-9X]+Y)?(?:[0-9X]+M)?(?:[0-9X]+W)?(?:[0-9X]+D)?"
    r"(?:T(?:[0-9X]+H)?(?:[0-9X]+M)?(?:[0-9X]+S)?)?")

_WEEKDAY_IRI = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
                "Saturday", "Sunday"]  # date.weekday() order

Row = Tuple[str, str, str, bool, str]  # s, p, o, is_literal, datatype


def _parse_opt(s: str) -> int:
    return -1 if "X" in s else int(s)


def _fmt_opt(v: int, four: bool) -> str:
    if four:
        return "XXXX" if v == -1 else f"{v:04d}"
    return "XX" if v == -1 else f"{v:02d}"


def _iso_week(year: int, month: int, day: int) -> int:
    """week-of-year with Monday first and minimalDaysInFirstWeek=1
    (Java GregorianCalendar config in OWLTime.java) — differs from ISO
    8601: the week containing Jan 1 is week 1."""
    d = _dt.date(year, month, day)
    jan1 = _dt.date(year, 1, 1)
    # days since the Monday of the week containing Jan 1
    offset = (d - (jan1 - _dt.timedelta(days=jan1.weekday()))).days
    return offset // 7 + 1


@dataclass(frozen=True)
class DateTime:
    year: int = -1
    month: int = -1
    week: int = -1
    day: int = -1
    day_of_week: int = -1  # 0=Monday .. 6=Sunday, -1 unknown
    hour: int = -1
    minute: int = -1
    second: int = -1

    @staticmethod
    def create(year: int, month: int, week: int, day: int,
               hour: int, minute: int, second: int) -> "DateTime":
        dow = -1
        if year != -1 and (week != -1 or month != -1 and day != -1):
            if month != -1 and day != -1:
                try:
                    d = _dt.date(year, month, day)
                    dow = d.weekday()
                    if week == -1:
                        week = _iso_week(year, month, day)
                except ValueError:
                    pass
            else:  # week != -1
                if day != -1:
                    for m in range(1, 13):
                        try:
                            if _iso_week(year, m, day) == week:
                                month = m
                                dow = _dt.date(year, m, day).weekday()
                                break
                        except ValueError:
                            continue
                elif week == 1:
                    month = 1
                else:
                    # Monday of that week
                    jan1 = _dt.date(year, 1, 1)
                    monday = jan1 - _dt.timedelta(days=jan1.weekday()) \
                        + _dt.timedelta(weeks=week - 1)
                    month = monday.month
        return DateTime(year, month, week, day, dow, hour, minute, second)

    def label(self) -> str:
        out = []
        has_date = (self.year != -1 or self.month != -1 or self.week != -1
                    or self.day != -1)
        has_time = self.hour != -1 or self.minute != -1 or self.second != -1
        if has_date:
            out.append(_fmt_opt(self.year, True))
            if self.week != -1 and self.day == -1:
                out.append("-W" + _fmt_opt(self.week, False))
            elif has_time or self.month != -1 or self.day != -1:
                out.append("-" + _fmt_opt(self.month, False))
                if has_time or self.day != -1:
                    out.append("-" + _fmt_opt(self.day, False))
        if has_time:
            if has_date:
                out.append("T")
            out.append(_fmt_opt(self.hour, False))
            if self.minute != -1 or self.second != -1:
                out.append(":" + _fmt_opt(self.minute, False))
                if self.second != -1:
                    out.append(":" + _fmt_opt(self.second, False))
        return "".join(out)

    def iri(self, ns: str = DEFAULT_TIME_NS) -> str:
        return ns + self.label().replace(":", ".") + "_desc"

    def to_rows(self, ns: str = DEFAULT_TIME_NS) -> Tuple[str, List[Row]]:
        iri = self.iri(ns)
        rows: List[Row] = [(iri, RDF_TYPE, OWLTIME_NS + "DateTimeDescription",
                            False, "")]
        unit = None
        for field, prop, u in (
                (self.year, "year", "unitYear"), (self.month, "month", "unitMonth"),
                (self.week, "week", "unitWeek"), (self.day, "day", "unitDay")):
            if field != -1:
                rows.append((iri, OWLTIME_NS + prop, str(field), True, _XSD_INT))
                unit = u
        if self.day_of_week != -1:
            rows.append((iri, OWLTIME_NS + "dayOfWeek",
                         OWLTIME_NS + _WEEKDAY_IRI[self.day_of_week], False, ""))
        for field, prop, u in ((self.hour, "hour", "unitHour"),
                               (self.minute, "minute", "unitMinute"),
                               (self.second, "second", "unitSecond")):
            if field != -1:
                rows.append((iri, OWLTIME_NS + prop, str(field), True, _XSD_INT))
                unit = u
        if unit:
            rows.append((iri, OWLTIME_NS + "unitType", OWLTIME_NS + unit,
                         False, ""))
        return iri, rows


@dataclass(frozen=True)
class Interval:
    begin: Optional[DateTime]
    end: Optional[DateTime]

    @staticmethod
    def parse_timex(value: str) -> Optional["Interval"]:
        century = decade = year = month = week = day = -1
        hour = minute = second = -1
        season = None
        weekend = False
        v = value.strip().upper()
        if not v or not _DATE_TIME_PATTERN.fullmatch(v):
            return None
        time_index = -1 if v.endswith("_REF") else v.find("T")
        time_part = v[time_index + 1:] if time_index >= 0 else None
        date_part = (v[:time_index] if time_index >= 0
                     else (None if ":" in v else v))

        if date_part:
            if date_part in ("PRESENT_REF", "PAST_REF", "FUTURE_REF"):
                pass  # underspecified references (reference TODO too)
            else:
                toks = date_part.split("-")
                if toks[0][0].isdigit() and not toks[0][-1].isdigit():
                    if len(toks[0]) == 4 and toks[0][1].isdigit():
                        if toks[0][2].isdigit():
                            decade = int(toks[0][:3]) * 10
                        else:
                            century = int(toks[0][:2]) * 100
                    else:
                        return None
                else:
                    year = _parse_opt(toks[0])
                    if len(toks) >= 2:
                        if not toks[1][-1].isdigit():
                            season = toks[1]
                        elif toks[1][0] == "W":
                            week = _parse_opt(toks[1][1:])
                            if len(toks) >= 3 and toks[2] == "WE":
                                weekend = True
                        else:
                            month = _parse_opt(toks[1])
                            day = _parse_opt(toks[2]) if len(toks) >= 3 else -1

        if time_part is not None and time_part not in (
                "MO", "MI", "AF", "EV", "NI", "PM", "DT", ""):
            toks = time_part.split(":")
            hour = _parse_opt(toks[0])
            if len(toks) >= 2:
                minute = _parse_opt(toks[1])
                if len(toks) >= 3:
                    second = _parse_opt(toks[2])

        if century != -1:
            return Interval(DateTime.create(century, 1, -1, 1, -1, -1, -1),
                            DateTime.create(century + 99, 12, -1, 31, -1, -1, -1))
        if decade != -1:
            return Interval(DateTime.create(decade, 1, -1, 1, -1, -1, -1),
                            DateTime.create(decade + 9, 12, -1, 31, -1, -1, -1))
        if season is not None:
            bounds = {"SP": ((year - 1, 12, 21), (year, 3, 19)),
                      "SU": ((year, 3, 20), (year, 6, 20)),
                      "FA": ((year, 6, 21), (year, 9, 21)),
                      "WI": ((year, 9, 22), (year, 12, 29))}
            if season not in bounds:
                return None
            (by, bm, bd), (ey, em, ed) = bounds[season]
            return Interval(DateTime.create(by, bm, -1, bd, -1, -1, -1),
                            DateTime.create(ey, em, -1, ed, -1, -1, -1))
        if weekend:
            if year == -1 or week == -1:
                return None
            jan1 = _dt.date(year, 1, 1)
            monday = jan1 - _dt.timedelta(days=jan1.weekday()) \
                + _dt.timedelta(weeks=week - 1)
            sat, sun = monday + _dt.timedelta(days=5), monday + _dt.timedelta(days=6)
            return Interval(
                DateTime.create(sat.year, sat.month, week, sat.day, -1, -1, -1),
                DateTime.create(sun.year, sun.month, week, sun.day, -1, -1, -1))
        d = DateTime.create(year, month, week, day, hour, minute, second)
        return Interval(d, d)

    def is_datetime_interval(self) -> bool:
        return (self.begin is not None and self.end is not None
                and self.begin == self.end)

    def label(self) -> str:
        if self.is_datetime_interval():
            return self.begin.label()
        b = "null" if self.begin is None else self.begin.label()
        e = "null" if self.end is None else self.end.label()
        return f"{b} - {e}"

    def iri(self, ns: str = DEFAULT_TIME_NS) -> str:
        return ns + self.label().replace(" - ", "_").replace(":", ".")

    def to_rows(self, ns: str = DEFAULT_TIME_NS) -> Tuple[str, List[Row]]:
        iri = self.iri(ns)
        rows: List[Row] = []
        if self.is_datetime_interval():
            desc_iri, desc_rows = self.begin.to_rows(ns)
            rows += desc_rows
            rows.append((iri, OWLTIME_NS + "hasDateTimeDescription", desc_iri,
                         False, ""))
            rows.append((iri, RDF_TYPE, OWLTIME_NS + "DateTimeInterval",
                         False, ""))
        else:
            for bound, prop in ((self.begin, "intervalStartedBy"),
                                (self.end, "intervalFinishedBy")):
                if bound is not None:
                    sub = Interval(bound, bound)
                    sub_iri, sub_rows = sub.to_rows(ns)
                    rows += sub_rows
                    rows.append((iri, OWLTIME_NS + prop, sub_iri, False, ""))
        rows.append((iri, RDF_TYPE, OWLTIME_NS + "ProperInterval", False, ""))
        rows.append((iri, RDFS_LABEL, self.label(), True, ""))
        return iri, rows


@dataclass(frozen=True)
class Duration:
    years: int = 0
    months: int = 0
    weeks: int = 0
    days: int = 0
    hours: int = 0
    minutes: int = 0
    seconds: int = 0

    @staticmethod
    def parse_timex(value: str) -> Optional["Duration"]:
        v = value.strip().upper()
        if not _DURATION_PATTERN.fullmatch(value):
            return None
        if not v.startswith("P"):
            return None
        vals = {"years": 0, "months": 0, "weeks": 0, "days": 0,
                "hours": 0, "minutes": 0, "seconds": 0}
        unknown = True
        start = 1
        inside_time = False
        for i in range(1, len(v)):
            ch = v[i]
            if ch == "T":
                inside_time = True
                start = i + 1
            elif not ch.isdigit() and ch != "X":
                num = _parse_opt(v[start:i])
                unknown = unknown and num == -1
                if num > 0:
                    if ch == "Y":
                        vals["years"] = num
                    elif ch == "M" and not inside_time:
                        vals["months"] = num
                    elif ch == "W":
                        vals["weeks"] = num
                    elif ch == "D":
                        vals["days"] = num
                    elif ch == "H":
                        vals["hours"] = num
                    elif ch == "M" and inside_time:
                        vals["minutes"] = num
                    elif ch == "S":
                        vals["seconds"] = num
                    else:
                        return None
                start = i + 1
        if unknown:
            return None
        return Duration(**vals)

    def label(self) -> str:
        out = ["P"]
        for v, u in ((self.years, "Y"), (self.months, "M"),
                     (self.weeks, "W"), (self.days, "D")):
            if v > 0:
                out.append(f"{v}{u}")
        if self.hours or self.minutes or self.seconds:
            out.append("T")
            for v, u in ((self.hours, "H"), (self.minutes, "M"),
                         (self.seconds, "S")):
                if v > 0:
                    out.append(f"{v}{u}")
        return "".join(out)

    def iri(self, ns: str = DEFAULT_TIME_NS) -> str:
        return ns + self.label() + "_desc"

    def to_rows(self, ns: str = DEFAULT_TIME_NS) -> Tuple[str, List[Row]]:
        iri = self.iri(ns)
        rows: List[Row] = [(iri, RDF_TYPE, OWLTIME_NS + "DurationDescription",
                            False, "")]
        # NOTE: the reference emits owltime:years for the DAYS field too
        # (OWLTime.java:688 — a copy/paste slip); we emit owltime:days,
        # documenting the deliberate divergence
        for v, prop in ((self.years, "years"), (self.months, "months"),
                        (self.weeks, "weeks"), (self.days, "days"),
                        (self.hours, "hours"), (self.minutes, "minutes"),
                        (self.seconds, "seconds")):
            if v > 0:
                rows.append((iri, OWLTIME_NS + prop, str(v), True, _XSD_INT))
        rows.append((iri, RDFS_LABEL, self.label(), True, ""))
        return iri, rows
