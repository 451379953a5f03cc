"""embulk_filter_column_spark — PySpark-native column-rule / CDC-ingest engine.

A from-scratch Spark re-expression of embulk/embulk-filter-column's
projection semantics (keep / drop / add / rename / defaults / nested-JSON
rules), generalized into a WAL-tail → lake-MERGE CDC pipeline
(see SURVEY.md and BASELINE.json north_rule).
"""

from .config import ColumnRule, FilterConfig  # noqa: F401
from .errors import (  # noqa: F401
    ConfigError,
    EngineError,
    JsonPathError,
    SchemaConfigError,
)
from .filter import apply_filter, apply_filters  # noqa: F401
from .schema import build_output_schema  # noqa: F401

__version__ = "0.1.0"
