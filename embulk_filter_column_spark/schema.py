"""Plan-time output-schema derivation (SURVEY.md §2.1 P1-P5).

Reference: ColumnFilterPlugin.buildOutputSchema
(ColumnFilterPlugin.java:142-256). Schema is derived once on the driver
before any data flows; field order is significant and preserved.

The reference's ``json`` column type is represented as a Spark StringType
field carrying ``{"engine.type": "json"}`` metadata (SURVEY.md §1.3), so
json-ness survives chained filter stages. ``binary`` is an engine extension
beyond the reference's six types (needed for the CDC web_pages ``html``
column) — copy/rename/drop only, no defaults.
"""

from __future__ import annotations

from pyspark.sql import types as T

from .config import FilterConfig
from .errors import ConfigError, SchemaConfigError
from .jsonpath import is_probably_json_path

JSON_META_KEY = "engine.type"

_SPARK_BY_ENGINE = {
    "boolean": T.BooleanType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "timestamp": T.TimestampType(),
    "json": T.StringType(),
}


def engine_type_of(field: T.StructField, config: FilterConfig) -> str:
    """Map a Spark field to the engine's type vocabulary."""
    if field.name in config.json_columns:
        return "json"
    if (field.metadata or {}).get(JSON_META_KEY) == "json":
        return "json"
    dt = field.dataType
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return "long"
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return "double"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.TimestampType):
        return "timestamp"
    if isinstance(dt, T.BinaryType):
        return "binary"
    # arrays/maps/structs/decimals pass through opaquely (engine extension)
    return "other:" + dt.simpleString()


def _field(name: str, etype: str, spark_type: T.DataType | None = None,
           nullable: bool = True) -> T.StructField:
    meta = {JSON_META_KEY: "json"} if etype == "json" else {}
    if spark_type is None:
        if etype not in _SPARK_BY_ENGINE:
            raise ConfigError("type: '%s' is not supported" % etype)
        spark_type = _SPARK_BY_ENGINE[etype]
    return T.StructField(name, spark_type, nullable, metadata=meta)


def build_output_schema(config: FilterConfig,
                        input_schema: T.StructType) -> T.StructType:
    """Port of ColumnFilterPlugin.buildOutputSchema — P2 (drop mode),
    P3 (keep mode), P4 (identity), P5 (add mode, always appended last)."""
    config.validate()
    in_fields = {f.name: f for f in input_schema.fields}
    out: list[T.StructField] = []

    if config.drop_columns:
        dropped = {r.name for r in config.drop_columns
                   if not is_probably_json_path(r.name)}
        for f in input_schema.fields:
            if f.name not in dropped:
                out.append(_field(f.name, engine_type_of(f, config),
                                  f.dataType, f.nullable))
    elif config.columns:
        for rule in config.columns:
            if is_probably_json_path(rule.name):
                continue
            if rule.src is not None and is_probably_json_path(rule.src):
                continue
            src_name = rule.src if rule.src is not None else rule.name
            in_f = in_fields.get(src_name)
            if in_f is not None:
                # filter or copy column — output type is always the INPUT
                # column's type (reference :194-196 ignores rule.type here)
                out.append(_field(rule.name, engine_type_of(in_f, config),
                                  in_f.dataType, in_f.nullable))
            elif rule.type is not None and rule.has_default:  # add column
                out.append(_field(rule.name, rule.type))
            else:
                raise SchemaConfigError(
                    "columns: Column src '%s' is not found in inputSchema. "
                    "Column '%s' does not have \"type\" and \"default\""
                    % (src_name, rule.name))
    else:
        for f in input_schema.fields:
            out.append(_field(f.name, engine_type_of(f, config),
                              f.dataType, f.nullable))

    # Add columns to last (reference :214-253). If you want to add to head
    # or middle, you can use `columns` option.
    for rule in config.add_columns:
        if is_probably_json_path(rule.name):
            continue
        if rule.src is not None and is_probably_json_path(rule.src):
            continue
        in_f = in_fields.get(rule.src) if rule.src is not None else None
        if in_f is not None:  # copy column
            out.append(_field(rule.name, engine_type_of(in_f, config),
                              in_f.dataType, in_f.nullable))
        elif rule.type is not None and rule.has_default:  # add column
            out.append(_field(rule.name, rule.type))
        else:
            raise SchemaConfigError(
                "add_columns: Column src '%s' is not found in inputSchema, "
                "Column '%s' does not have \"type\" and \"default\""
                % (rule.src, rule.name))

    return T.StructType(out)
