"""DateTools — dates as sortable resolution-truncated strings.

Reference: core/src/java/org/apache/lucene/document/DateTools.java — dates
render through the GMT pattern ``yyyyMMddHHmmssSSS`` cut to the resolution's
format length (Resolution enum, :172-199), so lexicographic string order ==
chronological order and a date range query is a plain string range (the
reference indexes these as terms; here the encoded column is a regular
string column, so range predicates stay sargable Catalyst comparisons that
reach the parquet scan).  ``stringToTime`` infers the resolution from the
string length (:103-121); ``round`` truncates trailing calendar fields via
deliberate switch fall-through (:144-169).

The Spark-side encoder builds the string from epoch-day date arithmetic
plus integer remainders — no session-timezone dependence, pure
whole-stage-codegen expressions.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F

# Resolution -> format length (DateTools.Resolution, :172-190)
RESOLUTIONS = {
    "year": 4, "month": 6, "day": 8, "hour": 10,
    "minute": 12, "second": 14, "millisecond": 17,
}

# default calendar fields appended when parsing a shorter string
# (SimpleDateFormat.parse of a truncated pattern: month/day default to 01,
# time fields to 0)
_PARSE_DEFAULTS = "0000" + "01" + "01" + "00" + "00" + "00" + "000"


def _check(resolution: str) -> int:
    if resolution not in RESOLUTIONS:
        raise ValueError(f"unknown resolution {resolution!r}")
    return RESOLUTIONS[resolution]


def time_to_string(time_ms: int, resolution: str) -> str:
    """DateTools.timeToString (:90-93): epoch millis → GMT
    yyyyMMddHHmmssSSS cut to the resolution length."""
    n = _check(resolution)
    d = _dt.datetime.fromtimestamp(time_ms / 1000.0, _dt.timezone.utc)
    full = (f"{d.year:04d}{d.month:02d}{d.day:02d}{d.hour:02d}"
            f"{d.minute:02d}{d.second:02d}{time_ms % 1000:03d}")
    return full[:n]


def date_to_string(date: _dt.datetime, resolution: str) -> str:
    """DateTools.dateToString (:78-80)."""
    return time_to_string(int(date.timestamp() * 1000), resolution)


def string_to_time(date_string: str) -> int:
    """DateTools.stringToTime (:103-113): the string's LENGTH selects the
    resolution; missing calendar fields default like SimpleDateFormat
    (month/day 01, time fields 0)."""
    n = len(date_string)
    if n not in RESOLUTIONS.values():
        raise ValueError(f"input is not a valid date string: {date_string}")
    s = date_string + _PARSE_DEFAULTS[n:]
    d = _dt.datetime(int(s[0:4]), int(s[4:6]), int(s[6:8]), int(s[8:10]),
                     int(s[10:12]), int(s[12:14]), int(s[14:17]) * 1000,
                     tzinfo=_dt.timezone.utc)
    return int(d.timestamp() * 1000)


def round_time(time_ms: int, resolution: str) -> int:
    """DateTools.round(long, Resolution) (:144-169): truncate every
    calendar field finer than the resolution (GMT)."""
    _check(resolution)
    return string_to_time(time_to_string(time_ms, resolution))


def time_to_string_col(ms: Column, resolution: str) -> Column:
    """Catalyst encoder: the same GMT string from an epoch-millis column.
    Date part via epoch-day arithmetic (DATE formatting carries no
    timezone), time part via integer remainders — stays inside
    whole-stage codegen, no UDF, no session-timezone dependence."""
    n = _check(resolution)
    days = F.floor(ms / F.lit(86400000)).cast("int")
    out = F.date_format(F.date_add(F.lit("1970-01-01").cast("date"), days),
                        "yyyyMMdd")
    if n <= 8:
        return F.substring(out, 1, n)
    rem = ms - days.cast("long") * F.lit(86400000)
    parts = [
        F.lpad(F.floor(rem / F.lit(3600000)).cast("string"), 2, "0"),
        F.lpad((F.floor(rem / F.lit(60000)) % 60).cast("string"), 2, "0"),
        F.lpad((F.floor(rem / F.lit(1000)) % 60).cast("string"), 2, "0"),
        F.lpad((rem % 1000).cast("string"), 3, "0"),
    ]
    out = F.concat(out, *parts)
    return F.substring(out, 1, n)


def date_range_predicate(encoded: Column, lo: str, hi: str,
                         include_lo: bool = True,
                         include_hi: bool = True) -> Column:
    """TermRangeQuery over DateTools-encoded strings: because the encoding
    is order-preserving, the range is two string comparisons (sargable —
    they reach the parquet scan as PushedFilters)."""
    lo_p = (encoded >= lo) if include_lo else (encoded > lo)
    hi_p = (encoded <= hi) if include_hi else (encoded < hi)
    return lo_p & hi_p
