"""Spark end-to-end filter tests.

Ports the reference's TestColumnVisitorImpl.java golden-row tests and the
example/ golden outputs (columns.txt, add_columns.txt, drop_columns.txt,
bracket_notations.txt) onto DataFrames.
"""

from datetime import datetime

import pytest
from pyspark.sql import types as T

from embulk_filter_column_spark import apply_filter, apply_filters
from embulk_filter_column_spark.schema import JSON_META_KEY

SIX_TYPE_SCHEMA = T.StructType([
    T.StructField("timestamp", T.TimestampType()),
    T.StructField("string", T.StringType()),
    T.StructField("boolean", T.BooleanType()),
    T.StructField("long", T.LongType()),
    T.StructField("double", T.DoubleType()),
    T.StructField("json", T.StringType(), metadata={JSON_META_KEY: "json"}),
    T.StructField("remove_me", T.StringType()),
])

EPOCH = datetime(1970, 1, 1)
TS_2015 = datetime(2015, 7, 13)


@pytest.fixture()
def six_type_df(spark):
    # TestColumnVisitorImpl.java:118-129 — one fully-populated row, one
    # all-NULL row (but for the marker column)
    rows = [
        (EPOCH, "string", True, 0, 0.5, '"json"', "remove_me"),
        (None, None, None, None, None, None, "remove_me"),
    ]
    return spark.createDataFrame(rows, SIX_TYPE_SCHEMA)


def test_keep_implicit_drop(spark, six_type_df):
    # TestColumnVisitorImpl.java:106-146
    out = apply_filter(six_type_df, {"columns": [
        {"name": "timestamp"}, {"name": "string"}, {"name": "boolean"},
        {"name": "long"}, {"name": "double"}, {"name": "json"},
    ]})
    assert out.columns == ["timestamp", "string", "boolean", "long",
                           "double", "json"]
    got = out.collect()
    assert tuple(got[0]) == (EPOCH, "string", True, 0, 0.5, '"json"')
    assert tuple(got[1]) == (None,) * 6


def test_defaults_on_null_all_types(spark, six_type_df):
    # TestColumnVisitorImpl.java:148-196
    out = apply_filter(six_type_df, {"columns": [
        {"name": "timestamp", "default": "2015-07-13", "format": "%Y-%m-%d",
         "timezone": "UTC"},
        {"name": "string", "default": "string"},
        {"name": "boolean", "default": True},
        {"name": "long", "default": 0},
        {"name": "double", "default": 0.5},
        {"name": "json", "type": "json", "default": '{"foo":"bar"}'},
    ]})
    got = out.collect()
    assert tuple(got[0]) == (EPOCH, "string", True, 0, 0.5, '"json"')
    assert tuple(got[1]) == (TS_2015, "string", True, 0, 0.5, '{"foo":"bar"}')


def test_rename_copy_via_src(spark, six_type_df):
    # TestColumnVisitorImpl.java:198-219
    out = apply_filter(six_type_df, {"columns": [
        {"name": "copy_of_string", "src": "string"},
        {"name": "string"},
    ]})
    got = out.collect()
    assert out.columns == ["copy_of_string", "string"]
    assert tuple(got[0]) == ("string", "string")
    assert tuple(got[1]) == (None, None)


def test_drop_mode(spark, six_type_df):
    # TestColumnVisitorImpl.java:221-259
    out = apply_filter(six_type_df, {"drop_columns": [
        {"name": "remove_me"}, {"name": "timestamp"}]})
    assert out.columns == ["string", "boolean", "long", "double", "json"]
    got = out.collect()
    assert tuple(got[0]) == ("string", True, 0, 0.5, '"json"')


def test_add_with_defaults(spark, six_type_df):
    # TestColumnVisitorImpl.java:261-294 — added columns appended last
    out = apply_filter(six_type_df, {"add_columns": [
        {"name": "added_ts", "type": "timestamp", "default": "2015-07-13",
         "format": "%Y-%m-%d", "timezone": "UTC"},
        {"name": "added_str", "type": "string", "default": "added"},
        {"name": "added_long", "type": "long", "default": 7},
        {"name": "added_double", "type": "double", "default": 1.5},
        {"name": "added_bool", "type": "boolean", "default": False},
        {"name": "added_json", "type": "json", "default": '{"a":1}'},
    ]})
    assert out.columns[:7] == list(six_type_df.columns)
    got = out.collect()
    for row in got:
        assert (row["added_ts"], row["added_str"], row["added_long"],
                row["added_double"], row["added_bool"], row["added_json"],
                ) == (TS_2015, "added", 7, 1.5, False, '{"a":1}')


def test_add_with_src_copy(spark, six_type_df):
    # TestColumnVisitorImpl.java:296-318
    out = apply_filter(six_type_df, {"add_columns": [
        {"name": "copy_of_long", "src": "long"}]})
    got = out.collect()
    assert got[0]["copy_of_long"] == 0
    assert got[1]["copy_of_long"] is None


# ---------------------------------------------------------------------------
# example/ end-to-end goldens
# ---------------------------------------------------------------------------

EXAMPLE_SCHEMA = T.StructType([
    T.StructField("time", T.TimestampType()),
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("score", T.DoubleType()),
    T.StructField("json", T.StringType(), metadata={JSON_META_KEY: "json"}),
])

NAME = "Vqjht6YEUBsMPXmoW1iOGFROZF27pBzz0TUkOKeDXEY"


@pytest.fixture()
def example_df(spark):
    # example/example.csv through the csv parser schema of example.yml
    rows = [
        (TS_2015, 0, NAME, 1370.0, '{"foo":"foo","bar":"bar"}'),
        (TS_2015, 0, NAME, 1370.0, '{"foo":"foo2"}'),
        (None, None, None, 9170.0, None),
    ]
    return spark.createDataFrame(rows, EXAMPLE_SCHEMA)


COLUMNS_FILTER = {
    "columns": [
        {"name": "time", "default": "2015-07-13", "format": "%Y-%m-%d"},
        {"name": "name", "default": "foo"},
        {"name": "foo", "default": 1, "type": "long"},
        {"name": "id"},
        {"name": "copy_score", "src": "score"},
        {"name": "json", "default": '{"foo":"FOO"}'},
        {"name": "$.json.foo"},
        {"name": "$.json.copy_foo", "src": "$.json.foo"},
    ]
}


def test_example_columns_golden(spark, example_df):
    # example/columns.yml → example/columns.txt
    out = apply_filter(example_df, COLUMNS_FILTER)
    assert out.columns == ["time", "name", "foo", "id", "copy_score", "json"]
    got = out.collect()
    assert [tuple(r) for r in got] == [
        (TS_2015, NAME, 1, 0, 1370.0, '{"foo":"foo","copy_foo":"foo"}'),
        (TS_2015, NAME, 1, 0, 1370.0, '{"foo":"foo2","copy_foo":"foo2"}'),
        (TS_2015, "foo", 1, None, 9170.0, '{"foo":"FOO","copy_foo":"FOO"}'),
    ]


def test_example_add_columns_golden(spark, example_df):
    # example/add_columns.yml → example/add_columns.txt
    # (Asia/Tokyo default timezone ⇒ 2015-07-12 15:00:00 UTC)
    out = apply_filter(example_df, {
        "default_timezone": "Asia/Tokyo",
        "default_timestamp_format": "%Y-%m-%d",
        "add_columns": [
            {"name": "foo", "type": "long", "default": 1},
            {"name": "d", "type": "timestamp", "default": "2015-07-13"},
            {"name": "t", "type": "timestamp",
             "default": "2015-07-13 00:00:00", "timezone": "UTC",
             "format": "%Y-%m-%d %H:%M:%S"},
            {"name": "copy_score", "src": "score"},
            {"name": "$.json.bar", "type": "long", "default": 1},
            {"name": "$.json.d", "type": "string", "default": "2015-07-13"},
            {"name": "$.json.copy_foo", "src": "$.json.foo"},
        ]})
    assert out.columns == ["time", "id", "name", "score", "json",
                           "foo", "d", "t", "copy_score"]
    got = out.collect()
    jst_midnight_utc = datetime(2015, 7, 12, 15, 0, 0)
    assert got[0]["json"] == (
        '{"foo":"foo","bar":"bar","d":"2015-07-13","copy_foo":"foo"}')
    assert got[1]["json"] == (
        '{"foo":"foo2","bar":1,"d":"2015-07-13","copy_foo":"foo2"}')
    assert got[2]["json"] is None
    for r in got:
        assert r["foo"] == 1
        assert r["d"] == jst_midnight_utc
        assert r["t"] == TS_2015
    assert [r["copy_score"] for r in got] == [1370.0, 1370.0, 9170.0]


def test_example_drop_columns_golden(spark, example_df):
    # example/drop_columns.yml → example/drop_columns.txt
    out = apply_filter(example_df, {"drop_columns": [
        {"name": "time"}, {"name": "id"}, {"name": "$.json.foo"}]})
    assert out.columns == ["name", "score", "json"]
    got = out.collect()
    assert [r["json"] for r in got] == ['{"bar":"bar"}', "{}", None]


def test_example_bracket_notations_golden(spark, example_df):
    # example/bracket_notations.yml → example/bracket_notations.txt
    # (three chained filter stages)
    stage1 = {"add_columns": [
        {"name": "$['json']['array.a']", "type": "json",
         "default": '[{"a":"a0"},{"a":"a1"}]'},
        {"name": "$['json']['array_b']", "type": "json",
         "default": '[{"b":"b"},{"b":"b"}]'},
    ]}
    stage2 = {"columns": [
        {"name": "time", "default": "2015-07-13", "format": "%Y-%m-%d"},
        {"name": "name", "default": "foo"},
        {"name": "foo", "default": 1, "type": "long"},
        {"name": "id"},
        {"name": "copy_score", "src": "score"},
        {"name": "json", "default":
            '{"foo":"FOO","array.a":[{"a":"default0"},{"a":"default1"}],'
            '"array_b":[{"b":"default"},{"b":"default"}]}'},
        {"name": "$['json']['foo']"},
        {"name": "$['json']['copy_foo']", "src": "$['json']['foo']"},
        {"name": "$['json']['drop_foo']", "src": "$['json']['foo']"},
        {"name": "$['json']['array_a']", "src": "$['json']['array.a']"},
        {"name": "$['json']['array_a'][0]"},
        {"name": "$['json']['array_b']"},
    ]}
    stage3 = {"drop_columns": [{"name": "$['json']['drop_foo']"}]}
    out = apply_filters(example_df, [stage1, stage2, stage3])
    got = out.collect()
    assert [r["json"] for r in got] == [
        '{"foo":"foo","copy_foo":"foo","array_a":[{"a":"a0"}],'
        '"array_b":[{"b":"b"},{"b":"b"}]}',
        '{"foo":"foo2","copy_foo":"foo2","array_a":[{"a":"a0"}],'
        '"array_b":[{"b":"b"},{"b":"b"}]}',
        '{"foo":"FOO","copy_foo":"FOO","array_a":[{"a":"default0"}],'
        '"array_b":[{"b":"default"},{"b":"default"}]}',
    ]


def test_binary_passthrough(spark):
    # engine extension: binary columns copy/rename/drop (CDC html column)
    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("html", T.BinaryType()),
    ])
    df = spark.createDataFrame([("u", bytearray(b"<html/>"))], schema)
    out = apply_filter(df, {"columns": [
        {"name": "page", "src": "html"}, {"name": "url"}]})
    got = out.collect()
    assert out.columns == ["page", "url"]
    assert bytes(got[0]["page"]) == b"<html/>"


def test_example_edgecase_golden(spark):
    r"""example/edgecase.yml over example/edgecase.tsv (the one example
    config without a .txt golden in the reference repo — expectations
    derived from the reference's parser semantics, which our ported
    parser pins):

    * doc key 1 (after JSON unescape):  phone']Num"]ber
    * rule 2/3 path property (after path unescape): phone']Num"]ber — match
    * doc key 3: foo\']"]foo  (literal backslash: JSON's \\ -> \)
    * rule 4 property: foo']"]foo  (path's \' -> ' eats the backslash)
      -> rule 4 matches NOTHING; the doc key is dropped, and the rule's
      key appears with a nil value (reference JsonVisitor puts the
      default — nil when unset — for a missing keep/copy source).
    * NULL row takes the column default, then rules apply to it.
    """
    schema = T.StructType([
        T.StructField("json", T.StringType(),
                      metadata={JSON_META_KEY: "json"}),
    ])
    rows = [
        ('{"phone\']Num\\"]ber":"foo","bar":"bar",'
         '"foo\\\\\']\\"]foo":"baz"}',),
        ('{"phone\']Num\\"]ber":"foo2","bar":"bar2",'
         '"foo\\\\\']\\"]foo":"baz2"}',),
        (None,),
    ]
    df = spark.createDataFrame(rows, schema)
    phone_path = '$.json["phone\']Num\\"]ber"]'
    out = apply_filter(df, {"columns": [
        {"name": "json", "default": '{"phone\']Num\\"]ber":"FOO"}'},
        {"name": phone_path},
        {"name": "$.json.copy_foo", "src": phone_path},
        {"name": '$.json[\'foo\\\']"]foo\']'},
    ]})
    import json as _json

    got = [r["json"] for r in out.collect()]
    key = "phone']Num\"]ber"
    ghost = "foo']\"]foo"   # rule-4 key: never present in the data
    assert [_json.loads(g) for g in got] == [
        {key: "foo", "copy_foo": "foo", ghost: None},
        {key: "foo2", "copy_foo": "foo2", ghost: None},
        {key: "FOO", "copy_foo": "FOO", ghost: None},
    ]
