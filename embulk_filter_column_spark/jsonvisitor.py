"""JSON rule tree: plan-time compilation + pure-Python document visitor.

Re-implements the reference's JsonVisitor/JsonColumn semantics
(JsonVisitor.java, JsonColumn.java) over plain Python values
(dict / list / str / int / float / bool / None). The compiled rule tree is
a picklable plain-data object embedded into the pandas-UDF closure at plan
time (SURVEY.md §2.1 P8, §2.2 R4-R12); Python dicts preserve insertion
order, matching msgpack-java's LinkedHashMap usage (JsonVisitor.java:63-65).

Representation notes
--------------------
* JSON null is Python ``None`` (msgpack Nil).
* "absent" (Java null from ``Map.get`` / array out-of-range) is the module
  sentinel ``ABSENT`` — present-but-null keys are *kept*, only absent keys
  fall back to rule defaults, exactly like the reference.
* Serialization is compact JSON — byte-compatible with the
  ``Value.toString()`` strings asserted by TestJsonVisitor.
"""

from __future__ import annotations

import json

from .config import FilterConfig
from .defaults import default_as_json_value
from .errors import ConfigError
from .jsonpath import (
    WILDCARD,
    CompiledPath,
    Idx,
    MultiProp,
    Prop,
    assert_json_path_format,
    assert_not_ends_with_wildcard,
    compile_path,
    is_probably_json_path,
)

ABSENT = object()

#: reference: JsonColumn.WILDCARD_INDEX (JsonColumn.java:52)
WILDCARD_INDEX = -1


def to_json_str(value) -> str:
    """Compact serialization matching msgpack-java Value.toString()."""
    return json.dumps(value, separators=(",", ":"), ensure_ascii=False)


class JsonColumnRule:
    """One compiled JSON rule (reference: JsonColumn.java).

    Plain-data and picklable. ``default_value`` is always a JSON value
    (None == Nil) — the ctor nil-coalesces like JsonColumn.java:72.
    """

    __slots__ = ("path", "type", "default_value", "src", "parent_path",
                 "tail_index", "tail_name", "src_tail_index", "src_tail_name")

    def __init__(self, path: str, col_type: str | None = None,
                 default_value=None, src: str | None = None):
        cp = compile_path(path)
        sp = compile_path(src) if src is not None else cp
        self.path = cp.canonical
        self.type = col_type
        self.default_value = default_value
        self.src = sp.canonical
        self.parent_path = cp.parent_path
        self.tail_index = self._tail_index(cp)
        self.tail_name = self._tail_name(cp)
        self.src_tail_index = self._tail_index(sp)
        self.src_tail_name = self._tail_name(sp)
        if sp.parent_path != cp.parent_path:
            # reference: JsonColumn.java:90-92
            raise ConfigError(
                'The branch (parent path) of src "%s" must be same with of '
                'name "%s" yet' % (src, path))

    @staticmethod
    def _tail_name(cp: CompiledPath) -> str | None:
        t = cp.tail
        if isinstance(t, MultiProp):
            # reference: JsonColumn.java:100-103
            raise ConfigError(
                'Multiple property is not supported "%s"' % cp.canonical)
        return t.name if isinstance(t, Prop) else None

    @staticmethod
    def _tail_index(cp: CompiledPath) -> int | None:
        t = cp.tail
        if isinstance(t, Idx):
            return t.index
        if t is WILDCARD:
            return WILDCARD_INDEX
        return None


def ancestor_json_columns(path: str) -> list:
    """Auto-fill ancestors of a JSONPath with typed empty defaults
    (reference: JsonVisitor.getAncestorJsonColumnList, JsonVisitor.java:289-316)::

        $['foo']['bar'][0]['baz'] →
          $['foo']            json  {}
          $['foo']['bar']     json  []
          $['foo']['bar'][0]  json  {}
    """
    cp = assert_json_path_format(path)
    out = []
    partial = "$"
    tokens = cp.tokens
    for i in range(len(tokens) - 1):
        partial = partial + tokens[i].fragment
        nxt = tokens[i + 1]
        default = [] if (isinstance(nxt, Idx) or nxt is WILDCARD) else {}
        out.append(JsonColumnRule(partial, "json", default))
    return out


class JsonRuleTree:
    """Compiled rule maps keyed by parent path (reference: JsonVisitor
    fields, JsonVisitor.java:61-67). Built once at plan time on the driver;
    pickled into the UDF closure."""

    def __init__(self, config: FilterConfig):
        self.should_visit_set: set = set()
        # parent path -> {canonical path -> JsonColumnRule}, insertion-ordered
        self.json_columns: dict = {}
        self.json_add_columns: dict = {}
        # parent path -> {canonical path}
        self.json_drop_columns: dict = {}
        self._build_should_visit_set(config)
        self._build(config)

    # -- plan-time builders -------------------------------------------------

    def _build_should_visit_set(self, config: FilterConfig) -> None:
        # reference: JsonVisitor.buildShouldVisitSet, :258-276
        for rule in (*config.columns, *config.add_columns,
                     *config.drop_columns):
            name = rule.name
            if not is_probably_json_path(name):
                continue
            assert_json_path_format(name)
            for anc in ancestor_json_columns(name):
                self.should_visit_set.add(anc.path)
            self.should_visit_set.add(compile_path(name).canonical)

    def _put(self, table: dict, rule: JsonColumnRule) -> None:
        table.setdefault(rule.parent_path, {})[rule.path] = rule

    def _contains(self, table: dict, path: str) -> bool:
        cp = compile_path(path)
        return cp.canonical in table.get(cp.parent_path, {})

    def _build(self, config: FilterConfig) -> None:
        # reference: JsonVisitor.buildJsonSchema, :243-255 — drop-mode
        # suppresses keep-mode; add always applies afterwards.
        if config.drop_columns:
            for rule in config.drop_columns:
                if not is_probably_json_path(rule.name):
                    continue
                cp = compile_path(rule.name)
                self.json_drop_columns.setdefault(
                    cp.parent_path, set()).add(cp.canonical)
        elif config.columns:
            self._build_keep(config)
        if config.add_columns:
            self._build_add(config)

    def _build_keep(self, config: FilterConfig) -> None:
        # reference: JsonVisitor.buildJsonColumns, :162-194
        for rule in config.columns:
            name = rule.name
            if not is_probably_json_path(name):
                continue
            assert_not_ends_with_wildcard(name)
            for anc in ancestor_json_columns(name):
                if not self._contains(self.json_columns, anc.path):
                    self._put(self.json_columns, anc)
            if rule.src is not None:
                self._put(self.json_columns,
                          JsonColumnRule(name, None, None, rule.src))
            elif rule.type is not None and rule.has_default:
                default = default_as_json_value(config, rule, rule.type)
                self._put(self.json_columns,
                          JsonColumnRule(name, rule.type, default))
            else:
                self._put(self.json_columns, JsonColumnRule(name, rule.type))

    def _build_add(self, config: FilterConfig) -> None:
        # reference: JsonVisitor.buildJsonAddColumns, :196-227
        for rule in config.add_columns:
            name = rule.name
            if not is_probably_json_path(name):
                continue
            assert_not_ends_with_wildcard(name)
            for anc in ancestor_json_columns(name):
                if not self._contains(self.json_add_columns, anc.path):
                    self._put(self.json_add_columns, anc)
            if rule.src is not None:
                self._put(self.json_add_columns,
                          JsonColumnRule(name, None, None, rule.src))
            elif rule.type is not None and rule.has_default:
                default = default_as_json_value(config, rule, rule.type)
                self._put(self.json_add_columns,
                          JsonColumnRule(name, rule.type, default))
            else:
                raise ConfigError(
                    "add_columns: Column '%s' does not have \"src\", or "
                    "\"type\" and \"default\"" % name)

    # -- run-time visitor ---------------------------------------------------

    def should_visit(self, json_path: str) -> bool:
        return json_path in self.should_visit_set

    @property
    def empty(self) -> bool:
        return not (self.json_columns or self.json_add_columns
                    or self.json_drop_columns)

    def _new_array_path(self, root_path: str, i: int) -> str:
        # reference: JsonVisitor.newArrayJsonPath, :323-330 — concrete
        # index, falling back to [*] when the concrete form isn't visited.
        new_path = "%s[%d]" % (root_path, i)
        if not self.should_visit(new_path):
            new_path = root_path + "[*]"
        return new_path

    def visit(self, root_path: str, value):
        """reference: JsonVisitor.visit, :480-497."""
        if not self.should_visit(root_path):
            return value
        if value is ABSENT:
            return ABSENT
        if isinstance(value, list):
            return self._visit_array(root_path, value)
        if isinstance(value, dict):
            return self._visit_map(root_path, value)
        return value

    def _visit_array(self, root_path: str, arr: list) -> list:
        # reference: JsonVisitor.visitArray, :339-413
        size = len(arr)
        out = []
        if root_path in self.json_drop_columns:
            drops = self.json_drop_columns[root_path]
            for i, v in enumerate(arr):
                new_path = self._new_array_path(root_path, i)
                if new_path not in drops:
                    out.append(self.visit(new_path, v))
        elif root_path in self.json_columns:
            for rule in self.json_columns[root_path].values():
                if rule.tail_index == WILDCARD_INDEX:
                    if rule.src_tail_index == WILDCARD_INDEX:
                        for v in arr:
                            visited = self.visit(rule.path, v)
                            out.append(None if visited is ABSENT else visited)
                    else:
                        raise ConfigError(
                            "renaming array elements from a different index "
                            'is not supported "%s"' % rule.path)
                else:
                    src = rule.src_tail_index
                    v = arr[src] if (src is not None and 0 <= src < size) \
                        else ABSENT
                    if v is ABSENT:
                        v = rule.default_value
                    visited = self.visit(rule.path, v)
                    out.append(None if visited is ABSENT else visited)
        else:
            for i, v in enumerate(arr):
                out.append(self.visit(self._new_array_path(root_path, i), v))
        if root_path in self.json_add_columns:
            for rule in self.json_add_columns[root_path].values():
                i = rule.tail_index
                if i == WILDCARD_INDEX or (i is not None and i < size):
                    # reference :393-400 — add index must be beyond current
                    # size; skip silently (flexible JSON)
                    continue
                src = rule.src_tail_index
                v = arr[src] if (src is not None and 0 <= src < size) \
                    else ABSENT
                if v is ABSENT:
                    v = rule.default_value
                visited = self.visit(rule.path, v)
                out.append(None if visited is ABSENT else visited)
        return out

    def _visit_map(self, root_path: str, obj: dict) -> dict:
        # reference: JsonVisitor.visitMap, :415-478
        out = {}
        if root_path in self.json_drop_columns:
            drops = self.json_drop_columns[root_path]
            for k, v in obj.items():
                # NOTE: raw concat, no escaping — bug-compatible with
                # JsonVisitor.newMapJsonPath, :332-337
                new_path = "%s['%s']" % (root_path, k)
                if new_path not in drops:
                    out[k] = self.visit(new_path, v)
        elif root_path in self.json_columns:
            for rule in self.json_columns[root_path].values():
                v = obj.get(rule.src_tail_name, ABSENT)
                if v is ABSENT:
                    v = rule.default_value
                visited = self.visit(rule.path, v)
                out[rule.tail_name] = None if visited is ABSENT else visited
        else:
            for k, v in obj.items():
                new_path = "%s['%s']" % (root_path, k)
                out[k] = self.visit(new_path, v)
        if root_path in self.json_add_columns:
            for rule in self.json_add_columns[root_path].values():
                if rule.tail_name in obj:
                    # reference :461-465 — key already exists: skip silently
                    continue
                v = obj.get(rule.src_tail_name, ABSENT)
                if v is ABSENT:
                    v = rule.default_value
                visited = self.visit(rule.path, v)
                out[rule.tail_name] = None if visited is ABSENT else visited
        return out
