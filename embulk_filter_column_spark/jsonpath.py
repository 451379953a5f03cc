"""Minimal JSONPath tokenizer / canonicalizer.

Implements exactly the JSONPath subset the reference supports — root,
single-quoted/double-quoted/dot properties, single array index, wildcard —
and rejects everything else with the reference's error vocabulary:

* scan (``..``), function (``.length()``), predicate (``[?(...)]``) tokens
  (reference: JsonPathUtil.java:54-69)
* array slice ``[1:2]`` and multi-index ``[0,1]``
  (reference: JsonPathUtil.java:71-79)
* multiple properties ``['a','b']`` (reference: JsonColumn.java:100-103)

Canonical form is the bracket/single-quote notation the reference's
PathCompiler produces (pinned by TestJsonColumn.java:29-94):
``$.foo.bar`` → ``$['foo']['bar']``, double quotes → single quotes,
single quotes in names escaped with a backslash.
"""

from __future__ import annotations

from dataclasses import dataclass

from .errors import JsonPathError

_ESCAPES = {"'": "'", '"': '"', "\\": "\\", "b": "\b", "f": "\f",
            "n": "\n", "r": "\r", "t": "\t", "/": "/"}
_UNESCAPES = {"\b": "\\b", "\f": "\\f", "\n": "\\n", "\r": "\\r", "\t": "\\t"}


def is_probably_json_path(name: str) -> bool:
    """Reference: PathCompiler.isProbablyJsonPath — used to decide whether a
    column name is a JSONPath rule or a plain top-level column name."""
    return name.startswith("$.") or name.startswith("$[")


@dataclass(frozen=True)
class Prop:
    """Single property access: ``['name']``."""
    name: str

    @property
    def fragment(self) -> str:
        return "['" + escape_property(self.name) + "']"


@dataclass(frozen=True)
class Idx:
    """Single array index access: ``[3]``."""
    index: int

    @property
    def fragment(self) -> str:
        return "[%d]" % self.index


class _Wildcard:
    __slots__ = ()

    @property
    def fragment(self) -> str:
        return "[*]"

    def __repr__(self) -> str:  # pragma: no cover
        return "WILDCARD"


WILDCARD = _Wildcard()

Token = object  # Prop | Idx | _Wildcard


def escape_property(name: str) -> str:
    """Escape a property name for single-quoted bracket notation
    (reference: jsonpath-compiler Utils.escape(str, true))."""
    out = []
    for ch in name:
        if ch == "\\":
            out.append("\\\\")
        elif ch == "'":
            out.append("\\'")
        elif ch in _UNESCAPES:
            out.append(_UNESCAPES[ch])
        else:
            out.append(ch)
    return "".join(out)


def _fail(path: str, msg: str) -> JsonPathError:
    # reference: ConfigException(String.format("jsonpath %s, %s", path, msg))
    # at JsonPathUtil.java:42 / JsonVisitor.java:297
    return JsonPathError("jsonpath %s, %s" % (path, msg))


class _Parser:
    def __init__(self, path: str):
        self.path = path
        self.pos = 0
        self.n = len(path)

    def error(self, msg: str) -> JsonPathError:
        return _fail(self.path, msg)

    def parse(self) -> tuple:
        p, n = self.path, self.n
        if n == 0 or p[0] != "$":
            raise self.error("Path must start with '$'")
        self.pos = 1
        tokens: list[Token] = []
        while self.pos < n:
            ch = p[self.pos]
            if ch == ".":
                if self.pos + 1 < n and p[self.pos + 1] == ".":
                    raise JsonPathError(
                        'scan path token is not supported "%s"' % self.path)
                self.pos += 1
                tokens.append(self._dot_property())
            elif ch == "[":
                self.pos += 1
                tokens.append(self._bracket())
            else:
                raise self.error(
                    "Illegal character at position %d expected '.' or '['"
                    % self.pos)
        return tuple(tokens)

    def _dot_property(self) -> Token:
        p, n = self.path, self.n
        start = self.pos
        while self.pos < n and p[self.pos] not in ".[":
            self.pos += 1
        name = p[start:self.pos]
        if name == "":
            raise self.error("Property must not be empty at index %d" % start)
        if name == "*":
            return WILDCARD
        if name.endswith("()"):
            raise JsonPathError(
                'function path token is not supported "%s"' % self.path)
        return Prop(name)

    def _bracket(self) -> Token:
        p, n = self.path, self.n
        if self.pos >= n:
            raise self.error("Expected token at index %d" % self.pos)
        ch = p[self.pos]
        if ch in "'\"":
            return self._quoted_property(ch)
        if ch == "?":
            raise JsonPathError(
                'predicate path token is not supported "%s"' % self.path)
        # unquoted: index / wildcard / slice / multi-index
        start = self.pos
        while self.pos < n and p[self.pos] != "]":
            self.pos += 1
        if self.pos >= n:
            raise self.error(
                "Expected close square bracket at index %d" % start)
        body = p[start:self.pos]
        self.pos += 1  # consume ']'
        body_stripped = body.strip()
        if body_stripped == "*":
            return WILDCARD
        if ":" in body_stripped:
            raise JsonPathError(
                'Array Slice Operation is not supported "%s"' % self.path)
        if "," in body_stripped:
            raise JsonPathError(
                'Multi Array Indexes is not supported "%s"' % self.path)
        try:
            return Idx(int(body_stripped))
        except ValueError:
            raise self.error(
                "Could not parse token at index %d" % start) from None

    def _quoted_property(self, quote: str) -> Token:
        p, n = self.path, self.n
        self.pos += 1  # consume opening quote
        out = []
        while True:
            if self.pos >= n:
                raise self.error(
                    "Property has not been closed - missing closing %s"
                    % quote)
            ch = p[self.pos]
            if ch == "\\":
                if self.pos + 1 >= n:
                    raise self.error("Invalid escape sequence at end of path")
                nxt = p[self.pos + 1]
                out.append(_ESCAPES.get(nxt, nxt))
                self.pos += 2
                continue
            if ch == quote:
                close_quote = self.pos
                self.pos += 1
                break
            out.append(ch)
            self.pos += 1
        if self.pos >= n or p[self.pos] not in "],":
            # message format pinned by TestJsonVisitor.java:865-879
            raise self.error(
                "Property must be separated by comma or "
                "Property must be terminated close square bracket at index %d"
                % close_quote)
        if p[self.pos] == ",":
            # multiple properties: survive compilation (reference compiles
            # them fine); rejected later at JsonColumn tail resolution
            # (JsonColumn.java:100-103)
            parts = [("".join(out))]
            while p[self.pos] == ",":
                self.pos += 1
                if self.pos >= n or p[self.pos] not in "'\"":
                    raise self.error(
                        "Expected a quoted property at index %d" % self.pos)
                q2 = p[self.pos]
                tok = self._quoted_property_inner(q2)
                parts.append(tok)
            if self.pos >= n or p[self.pos] != "]":
                raise self.error(
                    "Property must be terminated close square bracket "
                    "at index %d" % self.pos)
            self.pos += 1
            return MultiProp(tuple(parts))
        self.pos += 1  # consume ']'
        return Prop("".join(out))

    def _quoted_property_inner(self, quote: str) -> str:
        p, n = self.path, self.n
        self.pos += 1
        out = []
        while True:
            if self.pos >= n:
                raise self.error(
                    "Property has not been closed - missing closing %s"
                    % quote)
            ch = p[self.pos]
            if ch == "\\":
                nxt = p[self.pos + 1] if self.pos + 1 < n else ""
                out.append(_ESCAPES.get(nxt, nxt))
                self.pos += 2
                continue
            if ch == quote:
                self.pos += 1
                return "".join(out)
            out.append(ch)
            self.pos += 1


@dataclass(frozen=True)
class MultiProp:
    """``['a','b']`` — compiles, but is rejected wherever a single tail
    name is required (reference: JsonColumn.java:100-103)."""
    names: tuple

    @property
    def fragment(self) -> str:
        return "[" + ",".join(
            "'" + escape_property(x) + "'" for x in self.names) + "]"


class CompiledPath:
    """Canonicalized JSONPath (reference: io.github.medjed Path)."""

    __slots__ = ("raw", "tokens", "canonical")

    def __init__(self, raw: str, tokens: tuple):
        self.raw = raw
        self.tokens = tokens
        self.canonical = "$" + "".join(t.fragment for t in tokens)

    @property
    def parent_path(self) -> str:
        return "$" + "".join(t.fragment for t in self.tokens[:-1])

    @property
    def tail(self):
        return self.tokens[-1] if self.tokens else None

    @property
    def tail_fragment(self) -> str | None:
        return self.tokens[-1].fragment if self.tokens else None

    def __str__(self) -> str:  # pragma: no cover
        return self.canonical


def compile_path(path: str) -> CompiledPath:
    """Compile + canonicalize. Raises :class:`JsonPathError` for syntax
    errors and for path tokens the reference rejects at compile/validate
    time (scan / function / predicate / slice / multi-index)."""
    return CompiledPath(path, _Parser(path).parse())


def assert_json_path_format(path: str) -> CompiledPath:
    """Reference: JsonPathUtil.assertJsonPathFormat — compile and verify
    every token is supported. MultiProp is allowed here (the reference's
    PropertyPathToken passes this gate; it fails later at tail use)."""
    return compile_path(path)


def assert_not_ends_with_wildcard(path: str) -> None:
    """Reference: JsonPathUtil.assertDoNotEndsWithArrayWildcard — keep/add
    rules must not end with [*]."""
    cp = compile_path(path)
    if cp.tokens and cp.tokens[-1] is WILDCARD:
        raise JsonPathError(
            "%s wrongly ends with [*], perhaps you can remove the [*]"
            % cp.canonical)


def parent_path(path: str) -> str:
    """Reference: JsonColumn.parentPath (like File.dirname)."""
    return compile_path(path).parent_path


def tail_name(path: str) -> str | None:
    """Reference: JsonColumn.tailName — the tail path fragment string,
    e.g. ``['baz']`` or ``[0]``."""
    return compile_path(path).tail_fragment


def tail_index(path: str) -> int | None:
    """Reference: JsonColumn.getTailIndex(String)."""
    t = compile_path(path).tail
    if isinstance(t, Idx):
        return t.index
    return None
