"""Ported from reference TestJsonColumn.java and the JSONPath
ConfigException cases of TestJsonVisitor.java:744-879."""

import pytest

from embulk_filter_column_spark.errors import ConfigError, JsonPathError
from embulk_filter_column_spark.jsonpath import (
    assert_not_ends_with_wildcard,
    compile_path,
    is_probably_json_path,
    parent_path,
    tail_index,
    tail_name,
)
from embulk_filter_column_spark.jsonvisitor import JsonColumnRule


def test_canonicalize_dot_to_bracket():
    # TestJsonColumn.java:29-50
    col = JsonColumnRule("$.foo.bar")
    assert col.src == "$['foo']['bar']"
    assert col.default_value is None
    col = JsonColumnRule("$['foo']['bar']", "boolean", True)
    assert col.src == "$['foo']['bar']"
    assert col.default_value is True


def test_parent_path():
    # TestJsonColumn.java:53-61
    assert parent_path("$.foo.bar.baz") == "$['foo']['bar']"
    assert parent_path("$.foo.bar") == "$['foo']"
    assert parent_path("$['foo']") == "$"
    assert parent_path("$.foo[0][1]") == "$['foo'][0]"
    assert parent_path("$.foo[0]") == "$['foo']"
    assert parent_path("$[0]") == "$"


def test_tail_name():
    # TestJsonColumn.java:63-72
    assert tail_name("$['foo'].bar.baz") == "['baz']"
    assert tail_name("$.foo.bar") == "['bar']"
    assert tail_name("$.foo") == "['foo']"
    assert tail_name("$.foo[0][1]") == "[1]"
    assert tail_name("$.foo[0]") == "[0]"
    assert tail_name("$[0]") == "[0]"


def test_tail_name_value():
    # TestJsonColumn.java:74-83
    assert JsonColumnRule("$['foo'].bar.baz").tail_name == "baz"
    assert JsonColumnRule("$.foo.bar").tail_name == "bar"
    assert JsonColumnRule("$.foo").tail_name == "foo"
    assert JsonColumnRule("$.foo[0][1]").tail_name is None
    assert JsonColumnRule("$.foo[0]").tail_name is None
    assert JsonColumnRule("$[0]").tail_name is None


def test_tail_index():
    # TestJsonColumn.java:85-94
    assert tail_index("$['foo'].bar.baz") is None
    assert tail_index("$.foo.bar") is None
    assert tail_index("$.foo") is None
    assert tail_index("$.foo[0][1]") == 1
    assert tail_index("$.foo[0]") == 0
    assert tail_index("$[0]") == 0


def test_is_probably_json_path():
    assert is_probably_json_path("$.foo")
    assert is_probably_json_path("$['foo']")
    assert not is_probably_json_path("foo")
    assert not is_probably_json_path("$foo")


def test_escaped_single_quote_roundtrip():
    # TestJsonVisitor.java:723-742 — column name containing a single quote
    cp = compile_path("$['\\'json1']['k1']")
    assert cp.canonical == "$['\\'json1']['k1']"
    assert cp.parent_path == "$['\\'json1']"


def test_double_quotes_canonicalize_to_single():
    # TestJsonVisitor.java:669-694
    cp = compile_path('$["json1"]["k_1"][0]["k_1"]')
    assert cp.canonical == "$['json1']['k_1'][0]['k_1']"


def test_wildcard_canonical():
    assert compile_path("$.foo[*].bar").canonical == "$['foo'][*]['bar']"
    assert compile_path("$.foo.*").canonical == "$['foo'][*]"


def test_unsupported_scan():
    # TestJsonVisitor.java:797-808
    with pytest.raises(JsonPathError, match="scan path token"):
        compile_path("$.json1..key1")


def test_unsupported_function():
    # TestJsonVisitor.java:771-782
    with pytest.raises(JsonPathError, match="function path token"):
        compile_path("$['json1'].length()")


def test_unsupported_predicate():
    # TestJsonVisitor.java:784-795
    with pytest.raises(JsonPathError, match="predicate path token"):
        compile_path("$.store.book[?(@.price < 10)]")


def test_unsupported_multi_index():
    # TestJsonVisitor.java:810-834
    with pytest.raises(JsonPathError, match="Multi Array Indexes"):
        compile_path("$.json1[0,1]")
    with pytest.raises(JsonPathError, match="Multi Array Indexes"):
        compile_path("$.json1[0,1].key1")


def test_unsupported_slice():
    # TestJsonVisitor.java:836-860
    with pytest.raises(JsonPathError, match="Array Slice Operation"):
        compile_path("$.json1[1:2]")
    with pytest.raises(JsonPathError, match="Array Slice Operation"):
        compile_path("$.json1[1:2].key1")


def test_multi_property_rejected_at_tail():
    # TestJsonVisitor.java:744-755 — compiles, fails at JsonColumn
    with pytest.raises(ConfigError, match="Multiple property"):
        JsonColumnRule("$['json1','k1']")


def test_unclosed_bracket_message():
    # TestJsonVisitor.java:865-879 — exact message pinned
    with pytest.raises(JsonPathError) as ei:
        compile_path("$['json][''key1']")
    assert (
        "path $['json][''key1'], Property must be separated by comma or "
        "Property must be terminated close square bracket at index 9"
        in str(ei.value))


def test_bad_separator():
    # TestJsonVisitor.java:757-769
    with pytest.raises(JsonPathError):
        compile_path("$['json1'}['k1']")


def test_ends_with_wildcard_rejected():
    # TestJsonVisitor.java:177-199
    with pytest.raises(JsonPathError, match="wrongly ends with"):
        assert_not_ends_with_wildcard("$.json1.b.b[*]")
    assert_not_ends_with_wildcard("$.json1.b.b")  # ok


def test_src_parent_mismatch():
    # JsonColumn.java:90-92 / README "parent json path must be same"
    with pytest.raises(ConfigError, match="branch .*must be same"):
        JsonColumnRule("$.payload.foo.dest", src="$.payload.bar.src")
