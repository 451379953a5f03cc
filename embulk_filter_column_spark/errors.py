"""Engine exception hierarchy.

Mirrors the reference's error taxonomy (embulk's ConfigException /
SchemaConfigException raised by ColumnFilterPlugin.java:138,203,250 and
JsonPathUtil.java:42-92) without any Embulk dependency.
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class for all engine errors."""


class ConfigError(EngineError):
    """Invalid job / filter configuration (reference: ConfigException)."""


class SchemaConfigError(ConfigError):
    """Column rule refers to a column that cannot be resolved
    (reference: SchemaConfigException)."""


class JsonPathError(ConfigError):
    """Invalid or unsupported JSONPath (reference: ConfigException from
    JsonPathUtil / PathCompiler)."""
