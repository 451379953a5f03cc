"""Typed default-value coercion ladder.

Reference: ColumnVisitorImpl.getDefault (ColumnVisitorImpl.java:132-181) —
parses each rule's ``default`` once at plan time into a typed constant:

* boolean — YAML boolean
* long    — YAML int or string, ``Long.valueOf(obj.toString())``
* double  — YAML float or string, ``new Double(obj.toString())``
* string  — passthrough
* json    — JSON **string literal** parsed into a document
* timestamp — strftime-parsed with format/timezone/date options
"""

from __future__ import annotations

import json
from datetime import datetime

from .config import ColumnRule, FilterConfig
from .errors import ConfigError
from .timestamps import parse_strftime


def parse_default(config: FilterConfig, rule: ColumnRule, col_type: str):
    """Return the typed default for ``rule`` under output type ``col_type``,
    or None when the rule carries no default (Java returns null)."""
    if not rule.has_default:
        return None
    raw = rule.default
    if col_type == "boolean":
        if not isinstance(raw, bool):
            raise ConfigError(
                "default for boolean column '%s' must be a boolean, got %r"
                % (rule.name, raw))
        return raw
    if col_type == "long":
        try:
            return int(str(raw).strip())
        except ValueError as exc:
            raise ConfigError(
                "default for long column '%s': %r" % (rule.name, raw)) from exc
    if col_type == "double":
        try:
            return float(str(raw).strip())
        except ValueError as exc:
            raise ConfigError(
                "default for double column '%s': %r"
                % (rule.name, raw)) from exc
    if col_type == "string":
        return raw if isinstance(raw, str) else str(raw)
    if col_type == "json":
        if isinstance(raw, (dict, list)):
            return raw
        try:
            return json.loads(raw)
        except (TypeError, ValueError) as exc:
            raise ConfigError(
                "default for json column '%s' must be a JSON string literal, "
                "got %r" % (rule.name, raw)) from exc
    if col_type == "timestamp":
        fmt = rule.format or config.default_timestamp_format
        zone = rule.timezone or config.default_timezone
        date = rule.date or config.default_date
        dt = parse_strftime(str(raw), fmt, zone, date)
        # Spark TimestampType is naive-in-session-tz; engine pins session
        # timezone to UTC, so strip to naive UTC.
        return dt.replace(tzinfo=None)
    raise ConfigError("type: '%s' is not supported" % col_type)


def find_default(config: FilterConfig, name: str, col_type: str,
                 rules: list) -> object | None:
    """First rule whose name matches → its typed default
    (reference: ColumnVisitorImpl.java:122-130)."""
    for rule in rules:
        if rule.name == name:
            return parse_default(config, rule, col_type)
    return None


def default_as_json_value(config: FilterConfig, rule: ColumnRule,
                          col_type: str | None):
    """Default coerced for embedding inside a JSON document
    (reference: JsonVisitor.getDefault, JsonVisitor.java:79-106).
    ``type: timestamp`` is rejected inside JSON paths."""
    if col_type == "timestamp":
        raise ConfigError("type: timestamp is not available in json path")
    if col_type is None:
        return None
    value = parse_default(config, rule, col_type)
    if isinstance(value, datetime):  # pragma: no cover — guarded above
        raise ConfigError("type: timestamp is not available in json path")
    return value
