"""Top-level filter API: apply column-rule config(s) to a DataFrame.

Engine analog of the Embulk filter chain in example/bracket_notations.yml
(multiple ``- type: column`` stages applied in order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .config import FilterConfig


def apply_filter(df: DataFrame, config) -> DataFrame:
    """Apply one column-filter stage. ``config`` is a FilterConfig or the
    Embulk-style dict/YAML shape."""
    from .plans.compiler import compile_filter

    return compile_filter(config, df.schema).apply(df)


def apply_filters(df: DataFrame, configs) -> DataFrame:
    """Apply a chain of column-filter stages in order; each stage's output
    schema (including json markers) feeds the next."""
    for config in configs:
        df = apply_filter(df, config)
    return df


__all__ = ["apply_filter", "apply_filters", "FilterConfig"]
