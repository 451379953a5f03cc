"""Plan-time Ruby-strftime timestamp parsing for column defaults.

The reference parses timestamp defaults once at plan time with
org.embulk.util.timestamp.TimestampFormatter (ColumnVisitorImpl.java:160-179)
using Ruby strftime patterns, a default date for formats without date parts,
and a default timezone for formats without %z. This module reproduces that
in pure Python — defaults are plan-time constants, so there is zero runtime
cost (SURVEY.md §1.2).

Only the directive subset that can appear in ingest configs is implemented;
unknown directives raise ConfigError.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

from .errors import ConfigError

# strftime directive -> regex fragment (named groups)
_DIRECTIVES = {
    "Y": r"(?P<Y>-?\d{1,5})",
    "y": r"(?P<y>\d{2})",
    "m": r"(?P<m>\d{1,2})",
    "d": r"(?P<d>\d{1,2})",
    "e": r"\s?(?P<d>\d{1,2})",
    "j": r"(?P<j>\d{1,3})",
    "H": r"(?P<H>\d{1,2})",
    "k": r"\s?(?P<H>\d{1,2})",
    "I": r"(?P<I>\d{1,2})",
    "M": r"(?P<M>\d{1,2})",
    "S": r"(?P<S>\d{1,2})",
    "L": r"(?P<L>\d{1,3})",
    "N": r"(?P<N>\d{1,9})",
    "p": r"(?P<p>[AaPp][Mm.]?[Mm]?\.?)",
    "z": r"(?P<z>[+-]\d{2}:?\d{2}(:?\d{2})?|[+-]\d{2}|Z|UTC|GMT)",
    "Z": r"(?P<Z>[A-Za-z_/+\-0-9]+)",
    "a": r"(?P<a>[A-Za-z]{3})",
    "A": r"(?P<A>[A-Za-z]+)",
    "b": r"(?P<b>[A-Za-z]{3})",
    "B": r"(?P<B>[A-Za-z]+)",
    "s": r"(?P<s>\d+)",
    "%": "%",
}

_MONTHS = {m.lower(): i + 1 for i, m in enumerate(
    ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
     "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"])}


def _format_to_regex(fmt: str) -> str:
    out = []
    i, n = 0, len(fmt)
    seen = set()
    while i < n:
        ch = fmt[i]
        if ch == "%" and i + 1 < n:
            d = fmt[i + 1]
            if d in ("-", "0", "_", "^"):  # padding flags — skip
                i += 1
                d = fmt[i + 1] if i + 1 < n else ""
            frag = _DIRECTIVES.get(d)
            if frag is None:
                raise ConfigError(
                    "unsupported timestamp format directive %%%s in %r"
                    % (d, fmt))
            if d in seen and d != "%":
                frag = re.sub(r"\(\?P<\w+>", "(?:", frag)
            seen.add(d)
            out.append(frag)
            i += 2
        elif ch == " ":
            out.append(r"\s+")
            i += 1
        else:
            out.append(re.escape(ch))
            i += 1
    return "".join(out)


def _resolve_zone(zone_id: str):
    """Return a tzinfo for an IANA name or fixed offset string."""
    if zone_id in ("UTC", "GMT", "Z", "Etc/UTC"):
        return timezone.utc
    m = re.fullmatch(r"([+-])(\d{2}):?(\d{2})", zone_id)
    if m:
        sign = 1 if m.group(1) == "+" else -1
        return timezone(sign * timedelta(hours=int(m.group(2)),
                                         minutes=int(m.group(3))))
    try:
        from zoneinfo import ZoneInfo
        return ZoneInfo(zone_id)
    except Exception as exc:
        raise ConfigError("unknown timezone %r" % zone_id) from exc


def parse_strftime(value: str, fmt: str, zone_id: str = "UTC",
                   default_date: str = "1970-01-01") -> datetime:
    """Parse ``value`` against Ruby-strftime ``fmt``; return an aware UTC
    datetime (microsecond precision — Spark TimestampType granularity;
    the reference's %N nanoseconds are truncated).

    Missing date parts come from ``default_date``; missing zone from
    ``zone_id`` (reference: TimestampFormatter.builder(format, true)
    .setDefaultDateFromString(...).setDefaultZoneFromString(...)).
    """
    rx = _format_to_regex(fmt)
    m = re.fullmatch(rx, value.strip())
    if m is None:
        raise ConfigError(
            "cannot parse timestamp default %r with format %r" % (value, fmt))
    g = m.groupdict()

    dm = re.fullmatch(r"(\d{4})-(\d{2})-(\d{2})", default_date)
    if dm is None:
        raise ConfigError("invalid default_date %r" % default_date)
    year, month, day = int(dm.group(1)), int(dm.group(2)), int(dm.group(3))

    if g.get("s") is not None:  # %s — seconds since epoch, ignores the rest
        return datetime.fromtimestamp(int(g["s"]), tz=timezone.utc)

    if g.get("Y") is not None:
        year = int(g["Y"])
    elif g.get("y") is not None:
        yy = int(g["y"])
        year = 2000 + yy if yy < 69 else 1900 + yy
    if g.get("m") is not None:
        month = int(g["m"])
    elif g.get("b") is not None:
        month = _MONTHS[g["b"].lower()[:3]]
    elif g.get("B") is not None:
        month = _MONTHS[g["B"].lower()[:3]]
    if g.get("d") is not None:
        day = int(g["d"])

    hour = int(g["H"]) if g.get("H") is not None else 0
    if g.get("I") is not None:
        hour = int(g["I"]) % 12
        if g.get("p") and g["p"].lower().startswith("p"):
            hour += 12
    minute = int(g["M"]) if g.get("M") is not None else 0
    second = int(g["S"]) if g.get("S") is not None else 0
    micro = 0
    if g.get("N") is not None:
        micro = int(g["N"].ljust(9, "0")[:6])
    elif g.get("L") is not None:
        micro = int(g["L"].ljust(3, "0")) * 1000

    if g.get("z") is not None:
        tz = _resolve_zone(g["z"] if g["z"] not in ("Z",) else "UTC")
    elif g.get("Z") is not None:
        tz = _resolve_zone(g["Z"])
    else:
        tz = _resolve_zone(zone_id)

    if g.get("j") is not None:  # day-of-year overrides month/day
        base = datetime(year, 1, 1, hour, minute, second, micro, tzinfo=tz)
        dt = base + timedelta(days=int(g["j"]) - 1)
    else:
        dt = datetime(year, month, day, hour, minute, second, micro,
                      tzinfo=tz)
    return dt.astimezone(timezone.utc)
