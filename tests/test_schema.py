"""Ported from reference TestColumnFilterPlugin.java (schema derivation)."""

import pytest
from pyspark.sql import types as T

from embulk_filter_column_spark.config import FilterConfig
from embulk_filter_column_spark.errors import ConfigError, SchemaConfigError
from embulk_filter_column_spark.schema import (
    JSON_META_KEY,
    build_output_schema,
)

INPUT = T.StructType([
    T.StructField("timestamp", T.TimestampType()),
    T.StructField("string", T.StringType()),
    T.StructField("boolean", T.BooleanType()),
    T.StructField("long", T.LongType()),
    T.StructField("double", T.DoubleType()),
    T.StructField("json", T.StringType(), metadata={JSON_META_KEY: "json"}),
])


def names(schema):
    return [f.name for f in schema.fields]


def test_keep_mode_schema():
    # TestColumnFilterPlugin.java:97-127 — config order, implicit drop
    cfg = FilterConfig.from_dict({
        "columns": [
            {"name": "string"},
            {"name": "timestamp"},
        ]})
    out = build_output_schema(cfg, INPUT)
    assert names(out) == ["string", "timestamp"]
    assert isinstance(out["string"].dataType, T.StringType)
    assert isinstance(out["timestamp"].dataType, T.TimestampType)


def test_drop_mode_schema():
    # TestColumnFilterPlugin.java:129-159
    cfg = FilterConfig.from_dict({
        "drop_columns": [{"name": "string"}, {"name": "timestamp"}]})
    out = build_output_schema(cfg, INPUT)
    assert names(out) == ["boolean", "long", "double", "json"]


def test_add_mode_appends_last():
    # TestColumnFilterPlugin.java:161-189
    cfg = FilterConfig.from_dict({
        "add_columns": [
            {"name": "added", "type": "string", "default": "added"}]})
    out = build_output_schema(cfg, INPUT)
    assert names(out) == ["timestamp", "string", "boolean", "long",
                          "double", "json", "added"]
    assert isinstance(out["added"].dataType, T.StringType)


def test_columns_and_drop_columns_exclusive():
    # TestColumnFilterPlugin.java:191-205
    cfg = FilterConfig.from_dict({
        "columns": [{"name": "string"}],
        "drop_columns": [{"name": "boolean"}]})
    with pytest.raises(ConfigError, match="Either of"):
        build_output_schema(cfg, INPUT)


def test_keep_missing_src_without_type_default_raises():
    # ColumnFilterPlugin.java:203
    cfg = FilterConfig.from_dict({"columns": [{"name": "nope"}]})
    with pytest.raises(SchemaConfigError, match="not found in inputSchema"):
        build_output_schema(cfg, INPUT)


def test_add_missing_src_without_type_default_raises():
    # ColumnFilterPlugin.java:250
    cfg = FilterConfig.from_dict({"add_columns": [{"name": "x", "src": "nope"}]})
    with pytest.raises(SchemaConfigError, match="not found in inputSchema"):
        build_output_schema(cfg, INPUT)


def test_keep_new_column_with_type_default():
    cfg = FilterConfig.from_dict({
        "columns": [
            {"name": "long"},
            {"name": "d", "type": "timestamp", "default": "2015-07-13",
             "format": "%Y-%m-%d"},
        ]})
    out = build_output_schema(cfg, INPUT)
    assert names(out) == ["long", "d"]
    assert isinstance(out["d"].dataType, T.TimestampType)


def test_rename_copy_via_src():
    cfg = FilterConfig.from_dict({
        "columns": [{"name": "copy", "src": "string"}]})
    out = build_output_schema(cfg, INPUT)
    assert names(out) == ["copy"]
    assert isinstance(out["copy"].dataType, T.StringType)


def test_jsonpath_names_skipped_in_schema():
    # ColumnFilterPlugin.java:156-158,173-178,217-222
    cfg = FilterConfig.from_dict({
        "columns": [{"name": "json"}, {"name": "$.json.foo"}]})
    out = build_output_schema(cfg, INPUT)
    assert names(out) == ["json"]
    assert (out["json"].metadata or {}).get(JSON_META_KEY) == "json"


def test_identity_passthrough():
    cfg = FilterConfig.from_dict({})
    out = build_output_schema(cfg, INPUT)
    assert names(out) == names(INPUT)


def test_json_columns_marker_from_config():
    plain = T.StructType([T.StructField("payload", T.StringType())])
    cfg = FilterConfig.from_dict({"json_columns": ["payload"]})
    out = build_output_schema(cfg, plain)
    assert (out["payload"].metadata or {}).get(JSON_META_KEY) == "json"
