"""Rule-set → Spark Column-expression compiler (SURVEY.md §3.4 step 2).

Replaces the reference's per-row ColumnVisitorImpl (ColumnVisitorImpl.java)
with one declarative ``select``:

* scalar copy / rename / default-on-null → native ``col/coalesce/lit``
  expressions (whole-stage codegen, zero Python in the hot path)
* json columns with rules → ONE vectorized pandas UDF per column, whose
  closure holds the plan-time-compiled :class:`JsonRuleTree`

Everything (src map, default map, rule tree, constant default-JSON
serializations) is resolved once on the driver — the Spark analog of the
reference hoisting rule resolution out of the row loop
(ColumnVisitorImpl.java:59-69).
"""

from __future__ import annotations

from datetime import datetime

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import FilterConfig
from ..defaults import find_default
from ..errors import ConfigError
from ..jsonpath import escape_property
from ..jsonvisitor import JsonRuleTree, to_json_str
from ..schema import build_output_schema, engine_type_of


def _get_src(name: str, rules: list) -> str | None:
    """First rule matching ``name`` that carries ``src``
    (reference: ColumnVisitorImpl.getSrc, :111-120)."""
    for rule in rules:
        if rule.name == name and rule.src is not None:
            return rule.src
    return None


def _lit_default(value, etype: str) -> Column:
    """Typed literal for a plan-time default. Timestamps go through a
    string cast so the conversion happens JVM-side under the session
    timezone (UTC), independent of the Python process timezone."""
    if etype == "timestamp":
        assert isinstance(value, datetime)
        return F.lit(value.strftime("%Y-%m-%d %H:%M:%S.%f")).cast(
            T.TimestampType())
    if etype == "long":
        return F.lit(int(value)).cast(T.LongType())
    if etype == "double":
        return F.lit(float(value)).cast(T.DoubleType())
    if etype == "boolean":
        return F.lit(bool(value))
    if etype == "string":
        return F.lit(value)
    raise ConfigError("no literal default for type '%s'" % etype)


def _json_transform_fn(tree: JsonRuleTree, root_path: str,
                       default_str: str | None):
    """Build the per-batch pandas transform for one json column. The
    null→default result is a plan-time constant (the reference visits the
    default value too — ColumnVisitorImpl.java:259-267)."""
    import json as _json

    def _one(x):
        if x is None or x is pd.NA or (isinstance(x, float) and x != x):
            return default_str
        return to_json_str(tree.visit(root_path, _json.loads(x)))

    def _batch(s: pd.Series) -> pd.Series:
        return s.map(_one)

    return _batch


class CompiledFilter:
    """One compiled column-filter stage: output schema + select exprs."""

    def __init__(self, config: FilterConfig, input_schema: T.StructType):
        self.config = config
        self.input_schema = input_schema
        self.output_schema = build_output_schema(config, input_schema)
        self.tree = JsonRuleTree(config)
        self._in_fields = {f.name: f for f in input_schema.fields}
        self._exprs = [self._compile_column(f)
                       for f in self.output_schema.fields]

    # -- plan-time ----------------------------------------------------------

    def _resolve_src(self, name: str) -> T.StructField | None:
        """reference: ColumnVisitorImpl.buildOutputInputColumnMap, :72-92."""
        src = _get_src(name, self.config.columns)
        if src is None:
            src = _get_src(name, self.config.add_columns)
        if src is None:
            src = name
        return self._in_fields.get(src)

    def _resolve_default(self, name: str, etype: str):
        """reference: ColumnVisitorImpl.buildOutputDefaultMap, :95-109."""
        value = find_default(self.config, name, etype, self.config.columns)
        if value is None:
            value = find_default(self.config, name, etype,
                                 self.config.add_columns)
        return value

    def _compile_column(self, out_f: T.StructField) -> Column:
        name = out_f.name
        etype = engine_type_of(out_f, self.config)
        in_f = self._resolve_src(name)
        meta = dict(out_f.metadata or {})

        if etype == "json":
            return self._compile_json_column(name, in_f, meta)

        default = None
        if etype in ("boolean", "long", "double", "string", "timestamp"):
            default = self._resolve_default(name, etype)

        if in_f is not None and default is not None:
            expr = F.coalesce(F.col(in_f.name), _lit_default(default, etype))
        elif in_f is not None:
            expr = F.col(in_f.name)
        elif default is not None:
            expr = _lit_default(default, etype)
        else:
            expr = F.lit(None).cast(out_f.dataType)
        return expr.alias(name, metadata=meta) if meta else expr.alias(name)

    def _compile_json_column(self, name: str, in_f: T.StructField | None,
                             meta: dict) -> Column:
        root_path = "$['%s']" % escape_property(name)
        default = self._resolve_default(name, "json")

        if default is not None:
            visited = self.tree.visit(root_path, default)
            default_str = to_json_str(visited)
        else:
            default_str = None

        if in_f is None:
            expr = (F.lit(default_str) if default_str is not None
                    else F.lit(None).cast(T.StringType()))
        elif not self.tree.should_visit(root_path):
            # no rules touch this column — pure native passthrough
            # (the reference's shouldVisit prune, JsonVisitor.java:318-321)
            if default_str is not None:
                expr = F.coalesce(F.col(in_f.name), F.lit(default_str))
            else:
                expr = F.col(in_f.name)
        else:
            fn = _json_transform_fn(self.tree, root_path, default_str)
            udf = F.pandas_udf(fn, T.StringType())
            expr = udf(F.col(in_f.name))
        return expr.alias(name, metadata=meta)

    # -- run-time -----------------------------------------------------------

    def exprs(self) -> list:
        return list(self._exprs)

    def apply(self, df: DataFrame) -> DataFrame:
        return df.select(*self._exprs)


def compile_filter(config, input_schema: T.StructType) -> CompiledFilter:
    if not isinstance(config, FilterConfig):
        config = FilterConfig.from_dict(config)
    return CompiledFilter(config, input_schema)
