"""End-to-end reference pipelines: the `in: file + csv parser` half
(sources.files.read_embulk_file) feeding apply_filter — a reference user
can run example/example.yml and example/edgecase.yml unchanged.
File contents below are verbatim copies of the reference's example/
data files (example.csv, edgecase.tsv)."""

import json

import pytest

from embulk_filter_column_spark import apply_filter
from embulk_filter_column_spark.errors import ConfigError
from embulk_filter_column_spark.sources import (
    read_embulk_file,
    strftime_to_java,
)

EXAMPLE_CSV = (
    "time,id,name,score,json\r\n"
    "2015-07-13,0,Vqjht6YEUBsMPXmoW1iOGFROZF27pBzz0TUkOKeDXEY,1370,"
    '"{\\"foo\\":\\"foo\\",\\"bar\\":\\"bar\\"}"\r\n'
    "2015-07-13,0,Vqjht6YEUBsMPXmoW1iOGFROZF27pBzz0TUkOKeDXEY,1370,"
    '"{\\"foo\\":\\"foo2\\"}"\r\n'
    "NULL,NULL,,9170,NULL\r\n"
)

EXAMPLE_PARSER = {
    "type": "csv",
    "charset": "UTF-8",
    "newline": "CRLF",
    "null_string": "NULL",
    "skip_header_lines": 1,
    "comment_line_marker": "#",
    "columns": [
        {"name": "time", "type": "timestamp", "format": "%Y-%m-%d"},
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "json", "type": "json"},
    ],
}

EXAMPLE_FILTER = {
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


def test_strftime_to_java():
    assert strftime_to_java("%Y-%m-%d") == "yyyy-MM-dd"
    assert strftime_to_java("%Y-%m-%d %H:%M:%S") == "yyyy-MM-dd HH:mm:ss"
    assert strftime_to_java("%d/%b/%Y") == "dd/MMM/yyyy"
    with pytest.raises(ConfigError, match="no native"):
        strftime_to_java("%Q")


def test_strftime_padding_flags():
    """ADVICE r2: %-d etc. must map to the SINGLE-letter Java pattern
    (strict parse of '5' fails against 'dd'); '0' keeps the padded
    default; '_'/'^' have no strict equivalent and are rejected."""
    assert strftime_to_java("%-m/%-d/%Y") == "M/d/yyyy"
    assert strftime_to_java("%-H:%-M:%-S") == "H:m:s"
    assert strftime_to_java("%0d.%0m") == "dd.MM"
    assert strftime_to_java("%-Y") == "yyyy"   # '-' is a no-op on %Y
    with pytest.raises(ConfigError, match="no native"):
        strftime_to_java("%_d")
    with pytest.raises(ConfigError, match="no native"):
        strftime_to_java("%^b")


def test_strftime_unpadded_parses(spark):
    """The translated unpadded pattern round-trips through a strict
    Spark to_timestamp — the mistranslation this guards against yielded
    NULLs in PERMISSIVE mode."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("3/7/2024 9:5:1",)], ["raw"])
    pattern = strftime_to_java("%-m/%-d/%Y %-H:%-M:%-S")
    got = df.select(F.to_timestamp("raw", pattern).alias("ts")).first()
    assert got["ts"] is not None
    assert got["ts"].isoformat() == "2024-03-07T09:05:01"


def test_example_yml_end_to_end(spark, tmp_path):
    """example/example.yml over example/example.csv — the reference's
    flagship example, golden output example/columns.txt."""
    p = tmp_path / "example.csv"
    p.write_bytes(EXAMPLE_CSV.encode())
    df = read_embulk_file(spark, str(p), EXAMPLE_PARSER)
    assert [f.name for f in df.schema.fields] == \
        ["time", "id", "name", "score", "json"]
    assert df.schema["json"].metadata.get("engine.type") == "json"

    out = apply_filter(df, EXAMPLE_FILTER)
    rows = out.collect()
    assert [r["json"] for r in rows] == [
        '{"foo":"foo","copy_foo":"foo"}',
        '{"foo":"foo2","copy_foo":"foo2"}',
        '{"foo":"FOO","copy_foo":"FOO"}',
    ]
    # NULL row: every default applied (reference example/columns.txt)
    last = rows[2]
    assert str(last["time"]) == "2015-07-13 00:00:00"
    assert last["name"] == "foo"
    assert last["foo"] == 1
    assert last["id"] is None
    assert last["copy_score"] == 9170.0


EDGECASE_TSV = (
    "json\r\n"
    '{"phone\']Num\\"]ber":"foo","bar":"bar","foo\\\\\']\\"]foo":"baz"}\r\n'
    '{"phone\']Num\\"]ber":"foo2","bar":"bar2","foo\\\\\']\\"]foo":"baz2"}'
    "\r\n"
    "NULL\r\n"
)


def test_edgecase_yml_end_to_end(spark, tmp_path):
    """example/edgecase.yml over example/edgecase.tsv through the tsv
    parser config (delimiter \\t means no quote/escape processing should
    mangle the json text — embulk csv still strips quotes, but these
    lines are unquoted)."""
    p = tmp_path / "edgecase.tsv"
    p.write_bytes(EDGECASE_TSV.encode())
    parser = {
        "type": "csv",
        "delimiter": "\\t",
        "charset": "UTF-8",
        "newline": "CRLF",
        "null_string": "NULL",
        "skip_header_lines": 1,
        "comment_line_marker": "#",
        "columns": [{"name": "json", "type": "json"}],
    }
    df = read_embulk_file(spark, str(p), parser)
    phone_path = '$.json["phone\']Num\\"]ber"]'
    out = apply_filter(df, {"columns": [
        {"name": "json", "default": '{"phone\']Num\\"]ber":"FOO"}'},
        {"name": phone_path},
        {"name": "$.json.copy_foo", "src": phone_path},
        {"name": '$.json[\'foo\\\']"]foo\']'},
    ]})
    got = [json.loads(r["json"]) for r in out.collect()]
    key = "phone']Num\"]ber"
    ghost = "foo']\"]foo"
    assert got == [
        {key: "foo", "copy_foo": "foo", ghost: None},
        {key: "foo2", "copy_foo": "foo2", ghost: None},
        {key: "FOO", "copy_foo": "FOO", ghost: None},
    ]


def test_jsonl_parser(spark, tmp_path):
    """Embulk jsonl parser equivalent: typed columns, strftime
    timestamps, json-marked nested columns feeding JSONPath rules."""
    p = tmp_path / "data.jsonl"
    # nested objects, as embulk-parser-jsonl delivers json-typed columns;
    # Spark stringifies nested fields read under a StringType schema, so
    # they arrive as marked JSON text ready for the JSONPath rules
    p.write_text(
        '{"time":"2015-07-13","id":1,"meta":{"k":1,"x":9}}\n'
        '{"time":"2015-07-14","id":2,"meta":{"k":2,"x":8}}\n')
    df = read_embulk_file(spark, str(p), {
        "type": "jsonl",
        "columns": [
            {"name": "time", "type": "timestamp", "format": "%Y-%m-%d"},
            {"name": "id", "type": "long"},
            {"name": "meta", "type": "json"},
        ]})
    assert df.schema["meta"].metadata.get("engine.type") == "json"
    out = apply_filter(df, {
        "columns": [{"name": "id"}, {"name": "meta"},
                    {"name": "$.meta.k"}]})
    got = {r["id"]: r["meta"] for r in out.collect()}
    assert got == {1: '{"k":1}', 2: '{"k":2}'}


def test_skip_header_lines_multi(spark, tmp_path):
    """skip_header_lines > 1 (reference parity): a 3-line preamble per
    file is stripped before the distributed csv parse."""
    for i in (0, 1):
        p = tmp_path / f"part{i}.csv"
        p.write_text("# generated file\n# do not edit\ncol headers\n"
                     f"a{i},1\nb{i},2\n")
    parser = {
        "type": "csv",
        "skip_header_lines": 3,
        "columns": [{"name": "name", "type": "string"},
                    {"name": "n", "type": "long"}],
    }
    df = read_embulk_file(spark, str(tmp_path / "part*.csv"), parser)
    rows = sorted((r["name"], r["n"]) for r in df.collect())
    assert rows == [("a0", 1), ("a1", 1), ("b0", 2), ("b1", 2)]
