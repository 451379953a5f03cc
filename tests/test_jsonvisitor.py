"""Ported golden tests from reference TestJsonVisitor.java — exact compact
JSON serializations, key order significant."""

import pytest

from embulk_filter_column_spark.config import FilterConfig
from embulk_filter_column_spark.errors import ConfigError
from embulk_filter_column_spark.jsonvisitor import (
    JsonRuleTree,
    ancestor_json_columns,
    to_json_str,
)


def tree(**kwargs) -> JsonRuleTree:
    return JsonRuleTree(FilterConfig.from_dict(kwargs))


def run(t: JsonRuleTree, root: str, value) -> str:
    return to_json_str(t.visit(root, value))


def test_ancestor_json_column_list():
    # TestJsonVisitor.java:84-110
    subject = ancestor_json_columns("$.json1.a.default")
    assert [c.path for c in subject] == ["$['json1']", "$['json1']['a']"]
    assert [c.default_value for c in subject] == [{}, {}]

    subject = ancestor_json_columns("$.json1.a[0].default")
    assert [c.path for c in subject] == [
        "$['json1']", "$['json1']['a']", "$['json1']['a'][0]"]
    assert [c.default_value for c in subject] == [{}, [], {}]

    subject = ancestor_json_columns("$.json1.a.default[0]")
    assert [c.path for c in subject] == [
        "$['json1']", "$['json1']['a']", "$['json1']['a']['default']"]
    assert [c.default_value for c in subject] == [{}, {}, []]


def test_build_should_visit_set():
    # TestJsonVisitor.java:112-142
    t = tree(
        columns=[{"name": "$.json1.a.a.a"}],
        add_columns=[{"name": "$.json1.b.b[1].b", "type": "string",
                      "default": "foo"}],
        drop_columns=[{"name": "$.json1.c.c[*].c"}],
    )
    for p in ["$['json1']['a']['a']['a']", "$['json1']['a']['a']",
              "$['json1']['a']", "$['json1']['b']['b'][1]['b']",
              "$['json1']['b']['b'][1]", "$['json1']['b']['b']",
              "$['json1']['b']", "$['json1']['c']['c'][*]['c']",
              "$['json1']['c']['c'][*]", "$['json1']['c']['c']",
              "$['json1']['c']", "$['json1']"]:
        assert t.should_visit(p), p
    assert not t.should_visit("$['json2']")


def test_build_json_drop_columns():
    # TestJsonVisitor.java:144-175
    t = tree(drop_columns=[
        {"name": "$.json1.a.default"},
        {"name": "$.json1.a.copy"},
        {"name": "$.json1.a.copy_array[1]"},
    ])
    assert "$['json1']" not in t.json_drop_columns
    assert t.json_drop_columns["$['json1']['a']"] == {
        "$['json1']['a']['default']", "$['json1']['a']['copy']"}
    assert t.json_drop_columns["$['json1']['a']['copy_array']"] == {
        "$['json1']['a']['copy_array'][1]"}


def test_build_json_add_columns():
    # TestJsonVisitor.java:201-242
    t = tree(add_columns=[
        {"name": "$.json1.a.default", "type": "string", "default": "foo"},
        {"name": "$.json1.a.copy", "src": "$.json1.a.src"},
        {"name": "$.json1.a.copy_array[1]", "src": "$.json1.a.copy_array[0]"},
    ])
    for parent in ["$", "$['json1']", "$['json1']['a']",
                   "$['json1']['a']['copy_array']"]:
        assert parent in t.json_add_columns, parent
    inner = t.json_add_columns["$['json1']['a']"]
    assert list(inner.keys()) == [
        "$['json1']['a']['default']", "$['json1']['a']['copy']",
        "$['json1']['a']['copy_array']"]
    arr = t.json_add_columns["$['json1']['a']['copy_array']"]
    assert list(arr.keys()) == ["$['json1']['a']['copy_array'][1]"]


def test_build_json_columns():
    # TestJsonVisitor.java:244-286
    t = tree(columns=[
        {"name": "$.json1.a.default", "type": "string", "default": "foo"},
        {"name": "$.json1.a.copy", "src": "$.json1.a.src"},
        {"name": "$.json1.a.copy_array[1]", "src": "$.json1.a.copy_array[0]"},
    ])
    for parent in ["$", "$['json1']", "$['json1']['a']",
                   "$['json1']['a']['copy_array']"]:
        assert parent in t.json_columns, parent
    inner = t.json_columns["$['json1']['a']"]
    assert list(inner.keys()) == [
        "$['json1']['a']['default']", "$['json1']['a']['copy']",
        "$['json1']['a']['copy_array']"]


def test_drop_columns_overcome_columns():
    # TestJsonVisitor.java:288-308 — "drop_columns overcome columns"
    cfg = FilterConfig(
        drop_columns=[{"name": "$.json1.a.default"}],
        add_columns=[{"name": "$.json1.a.copy", "src": "$.json1.a.src"}],
        columns=[{"name": "$.json1.a.copy_array[1]",
                  "src": "$.json1.a.copy_array[0]"}],
    )
    t = JsonRuleTree(cfg)
    assert t.json_drop_columns
    assert t.json_add_columns
    assert not t.json_columns


def test_visit_map_drop():
    # TestJsonVisitor.java:310-334
    t = tree(drop_columns=[{"name": "$.json1.k1.k1"},
                           {"name": "$.json1.k2"}])
    doc = {"k1": {"k1": "v"}, "k2": {"k2": "v"}}
    assert run(t, "$['json1']", doc) == '{"k1":{}}'


def test_visit_map_add():
    # TestJsonVisitor.java:336-360
    t = tree(add_columns=[
        {"name": "$.json1.k3.k3", "type": "string", "default": "v"},
        {"name": "$.json1.k4", "src": "$.json1.k2"},
    ])
    doc = {"k1": {"k1": "v"}, "k2": {"k2": "v"}}
    assert run(t, "$['json1']", doc) == (
        '{"k1":{"k1":"v"},"k2":{"k2":"v"},"k3":{"k3":"v"},"k4":{"k2":"v"}}')


def test_visit_map_keep():
    # TestJsonVisitor.java:362-388
    t = tree(columns=[
        {"name": "$.json1.k1"},
        {"name": "$.json1.k2.k2"},
        {"name": "$.json1.k3.k3", "type": "string", "default": "v"},
        {"name": "$.json1.k4", "src": "$.json1.k2"},
    ])
    # Java builds newMap(k1, newMap(k1, v), k2, newMap(k2, v))
    doc = {"k1": {"k1": "v"}, "k2": {"k2": "v"}}
    assert run(t, "$['json1']", doc) == (
        '{"k1":{"k1":"v"},"k2":{"k2":"v"},"k3":{"k3":"v"},"k4":{"k2":"v"}}')


def test_visit_array_drop():
    # TestJsonVisitor.java:390-417 — [*] fallback + element compaction
    t = tree(drop_columns=[
        {"name": "$.json1.k1[0].k1"},
        {"name": "$.json1.k2[*]"},  # trailing [*] allowed for drop only
        {"name": "$.json1.k3[*].k1"},
    ])
    doc = {"k1": [{"k1": "v"}], "k2": ["v", "v"], "k3": [{"k1": "v"}]}
    assert run(t, "$['json1']", doc) == '{"k1":[{}],"k2":[],"k3":[{}]}'


def test_visit_array_add():
    # TestJsonVisitor.java:419-447
    t = tree(add_columns=[
        {"name": "$.json1.k1[1]", "src": "$.json1.k1[0]"},
        {"name": "$.json1.k3[*].k2", "type": "string", "default": "v"},
        {"name": "$.json1.k4[*].k1", "type": "string", "default": "v"},
        {"name": "$.json1.k5[0].k1", "type": "string", "default": "v"},
    ])
    doc = {"k1": [{"k1": "v"}], "k2": ["v", "v"], "k3": [{"k1": "v"}]}
    assert run(t, "$['json1']", doc) == (
        '{"k1":[{"k1":"v"},{"k1":"v"}],"k2":["v","v"],'
        '"k3":[{"k1":"v","k2":"v"}],"k4":[],"k5":[{"k1":"v"}]}')


def test_visit_array_keep():
    # TestJsonVisitor.java:449-479
    t = tree(columns=[
        {"name": "$.json1.k1[1]", "src": "$.json1.k1[0]"},
        {"name": "$.json1.k2[0]"},
        {"name": "$.json1.k3[*].k1"},
        {"name": "$.json1.k3[*].k3", "src": "$.json1.k3[*].k1"},
        {"name": "$.json1.k4[*].k1", "type": "string", "default": "v"},
        {"name": "$.json1.k5[0].k1", "type": "string", "default": "v"},
    ])
    doc = {"k1": [{"k1": "v"}, "v"], "k2": ["v", "v"],
           "k3": [{"k1": "v", "k2": "v"}]}
    assert run(t, "$['json1']", doc) == (
        '{"k1":[{"k1":"v"}],"k2":["v"],"k3":[{"k1":"v","k3":"v"}],'
        '"k4":[],"k5":[{"k1":"v"}]}')


def test_visit_map_drop_bracket():
    # TestJsonVisitor.java:481-505
    t = tree(drop_columns=[{"name": "$['json1']['k1']['k1']"},
                           {"name": "$['json1']['k2']"}])
    doc = {"k1": {"k1": "v"}, "k2": {"k2": "v"}}
    assert run(t, "$['json1']", doc) == '{"k1":{}}'


def test_visit_map_add_bracket():
    # TestJsonVisitor.java:507-531
    t = tree(add_columns=[
        {"name": "$['json1']['k3']['k3']", "type": "string", "default": "v"},
        {"name": "$['json1']['k4']", "src": "$['json1']['k2']"},
    ])
    doc = {"k1": {"k1": "v"}, "k2": {"k2": "v"}}
    assert run(t, "$['json1']", doc) == (
        '{"k1":{"k1":"v"},"k2":{"k2":"v"},"k3":{"k3":"v"},"k4":{"k2":"v"}}')


def test_visit_map_keep_bracket():
    # TestJsonVisitor.java:533-558
    t = tree(columns=[
        {"name": "$['json1']['k1']"},
        {"name": "$['json1']['k2']['k2']"},
        {"name": "$['json1']['k3']['k3']", "type": "string", "default": "v"},
        {"name": "$['json1']['k4']", "src": "$['json1']['k2']"},
    ])
    doc = {"k1": {"k1": "v"}, "k2": {"k2": "v"}}
    assert run(t, "$['json1']", doc) == (
        '{"k1":{"k1":"v"},"k2":{"k2":"v"},"k3":{"k3":"v"},"k4":{"k2":"v"}}')


def test_visit_array_drop_bracket():
    # TestJsonVisitor.java:560-584
    t = tree(drop_columns=[{"name": "$['json1']['k1'][0]['k1']"},
                           {"name": "$['json1']['k2'][*]"}])
    doc = {"k1": [{"k1": "v"}], "k2": ["v", "v"]}
    assert run(t, "$['json1']", doc) == '{"k1":[{}],"k2":[]}'


def test_visit_array_add_bracket():
    # TestJsonVisitor.java:586-610
    t = tree(add_columns=[
        {"name": "$['json1']['k1'][1]", "src": "$['json1']['k1'][0]"},
        {"name": "$['json1']['k3'][0]['k3']", "type": "string",
         "default": "v"},
    ])
    doc = {"k1": [{"k1": "v"}], "k2": ["v", "v"]}
    assert run(t, "$['json1']", doc) == (
        '{"k1":[{"k1":"v"},{"k1":"v"}],"k2":["v","v"],"k3":[{"k3":"v"}]}')


def test_visit_array_keep_bracket():
    # TestJsonVisitor.java:612-636
    t = tree(columns=[
        {"name": "$['json1']['k1'][1]", "src": "$['json1']['k1'][0]"},
        {"name": "$['json1']['k2'][0]"},
        {"name": "$['json1']['k3'][0]['k3']", "type": "string",
         "default": "v"},
    ])
    doc = {"k1": [{"k1": "v"}, "v"], "k2": ["v", "v"]}
    assert run(t, "$['json1']", doc) == (
        '{"k1":[{"k1":"v"}],"k2":["v"],"k3":[{"k3":"v"}]}')


def test_visit_with_dot_and_bracket_mixed():
    # TestJsonVisitor.java:640-665
    t = tree(columns=[
        {"name": "$.json1['k_1']"},
        {"name": "$.json1['k_1'][0]['k_1']"},
        {"name": "$['json1']['k_2']"},
        {"name": "$['json1']['k_2']['k_2']"},
    ])
    doc = {"k_1": [{"k_1": "v"}], "k_2": {"k_2": "v"}}
    assert run(t, "$['json1']", doc) == (
        '{"k_1":[{"k_1":"v"}],"k_2":{"k_2":"v"}}')


def test_visit_with_single_and_double_quotes():
    # TestJsonVisitor.java:669-694
    t = tree(columns=[
        {"name": "$['json1']['k_1']", "src": "$['json1']['k.1']"},
        {"name": '$["json1"]["k_1"][0]["k_1"]',
         "src": '$["json1"]["k_1"][0]["k.1"]'},
        {"name": '$["json1"]["k_2"]', "src": '$["json1"]["k.2"]'},
        {"name": '$["json1"]["k_2"]["k_2"]',
         "src": '$["json1"]["k_2"]["k.2"]'},
    ])
    doc = {"k.1": [{"k.1": "v"}], "k.2": {"k.2": "v"}}
    assert run(t, "$['json1']", doc) == (
        '{"k_1":[{"k_1":"v"}],"k_2":{"k_2":"v"}}')


def test_visit_with_complex_rename():
    # TestJsonVisitor.java:696-721
    t = tree(columns=[
        {"name": "$.json1['k____1']", "src": "$.json1['k.-=+1']"},
        {"name": "$.json1['k____1'][0]['k____1']",
         "src": "$.json1['k____1'][0]['k.-=+1']"},
        {"name": "$['json1']['k_2']", "src": "$['json1']['k.2']"},
        {"name": "$['json1']['k_2']['k_2']", "src": "$['json1']['k_2']['k.2']"},
    ])
    doc = {"k.-=+1": [{"k.-=+1": "v"}], "k.2": {"k.2": "v"}}
    assert run(t, "$['json1']", doc) == (
        '{"k____1":[{"k____1":"v"}],"k_2":{"k_2":"v"}}')


def test_visit_with_column_name_including_single_quotes():
    # TestJsonVisitor.java:723-742
    t = tree(columns=[{"name": "$['\\'json1']['k1']"}])
    doc = {"k1": "v"}
    assert run(t, "$['\\'json1']", doc) == '{"k1":"v"}'


def test_add_columns_missing_src_type_default():
    # JsonVisitor.java:224
    with pytest.raises(ConfigError, match="does not have"):
        tree(add_columns=[{"name": "$.json1.k1"}])


def test_untouched_json_column_passthrough():
    # prune-set check (TestJsonVisitor.java:141) — json2 untouched
    t = tree(columns=[{"name": "$.json1.k1"}])
    doc = {"z": 1, "a": [1, 2, {"x": None}]}
    assert t.visit("$['json2']", doc) is doc


def test_scalar_and_null_passthrough():
    t = tree(columns=[{"name": "$.json1.k1"}])
    assert t.visit("$['json1']", "scalar") == "scalar"
    assert t.visit("$['json1']", None) is None


def test_keep_missing_key_emits_null():
    # JsonVisitor.visitMap keep branch: absent src, no default → Nil kept
    t = tree(columns=[{"name": "$.json1.nope"}])
    assert run(t, "$['json1']", {"k": "v"}) == '{"nope":null}'


def test_present_but_null_key_is_kept_not_defaulted():
    # Java Map.get returns NilValue (non-null) for present null — the
    # default only applies to ABSENT keys
    t = tree(columns=[
        {"name": "$.json1.k", "type": "string", "default": "d"}])
    assert run(t, "$['json1']", {"k": None}) == '{"k":null}'
    assert run(t, "$['json1']", {}) == '{"k":"d"}'


def test_timestamp_type_rejected_in_json_path():
    # JsonVisitor.java:100-102
    with pytest.raises(ConfigError, match="timestamp is not available"):
        tree(add_columns=[{"name": "$.json1.t", "type": "timestamp",
                           "default": "2015-07-13"}])


def test_wildcard_tail_rejected_columns():
    # TestJsonVisitor.java assertDoNotEndsWithArrayWildcard_Columns: a
    # keep rule whose path ends with [*] is a config error ("perhaps
    # you can remove the [*]")
    with pytest.raises(ConfigError, match="wrongly ends with"):
        tree(columns=[{"name": "$.json1.b.b[*]"}])
    # drop rules MAY end with [*] (drop-all-elements fallback)
    tree(drop_columns=[{"name": "$.json1.b.b[*]"}])


def test_wildcard_tail_rejected_add_columns():
    # TestJsonVisitor.java assertDoNotEndsWithArrayWildcard_AddColumns:
    # the same rejection for the add_columns rule family
    with pytest.raises(ConfigError, match="wrongly ends with"):
        tree(add_columns=[{"name": "$.json1.b.b[*]",
                           "type": "json", "default": "[]"}])
