"""Job / filter configuration model.

Mirrors the reference's PluginTask / ColumnConfig
(ColumnFilterPlugin.java:60-121) as plain dataclasses so the compiled plan
is trivially picklable into Spark closures. Loadable from the same YAML/dict
shape the reference accepts::

    columns:
      - {name: time, default: "2015-07-13", format: "%Y-%m-%d"}
      - {name: id}
      - {name: $.json.foo}
    add_columns:
      - {name: d, type: timestamp, default: "2015-07-13"}
    drop_columns:
      - {name: score}
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .errors import ConfigError

#: the reference's six column types (ColumnVisitorImpl.java:132-181)
TYPES = ("boolean", "long", "double", "string", "timestamp", "json")

DEFAULT_TIMESTAMP_FORMAT = "%Y-%m-%d %H:%M:%S.%N %z"
DEFAULT_TIMEZONE = "UTC"
DEFAULT_DATE = "1970-01-01"

_NO_DEFAULT = object()


@dataclass
class ColumnRule:
    """One entry of columns / add_columns / drop_columns
    (reference: ColumnConfig interface, ColumnFilterPlugin.java:60-91)."""

    name: str
    type: str | None = None
    default: object = _NO_DEFAULT
    src: str | None = None
    format: str | None = None
    timezone: str | None = None
    date: str | None = None

    @property
    def has_default(self) -> bool:
        return self.default is not _NO_DEFAULT

    def __post_init__(self) -> None:
        if self.type is not None and self.type not in TYPES:
            raise ConfigError("type: '%s' is not supported" % self.type)

    @classmethod
    def from_dict(cls, d: dict) -> "ColumnRule":
        if "name" not in d:
            raise ConfigError("column rule requires a name: %r" % (d,))
        unknown = set(d) - {"name", "type", "default", "src", "format",
                            "timezone", "date"}
        if unknown:
            raise ConfigError("unknown column rule keys %s in %r"
                              % (sorted(unknown), d))
        return cls(
            name=str(d["name"]),
            type=d.get("type"),
            default=d["default"] if "default" in d else _NO_DEFAULT,
            src=d.get("src"),
            format=d.get("format"),
            timezone=d.get("timezone"),
            date=d.get("date"),
        )


@dataclass
class FilterConfig:
    """One column-filter stage (reference: PluginTask,
    ColumnFilterPlugin.java:93-121). ``json_columns`` declares which
    string-typed input columns hold JSON documents — the stand-in for
    Embulk's native ``json`` column type (SURVEY.md §1.3)."""

    columns: list = field(default_factory=list)
    add_columns: list = field(default_factory=list)
    drop_columns: list = field(default_factory=list)
    default_timestamp_format: str = DEFAULT_TIMESTAMP_FORMAT
    default_timezone: str = DEFAULT_TIMEZONE
    default_date: str = DEFAULT_DATE
    json_columns: tuple = ()

    def __post_init__(self) -> None:
        self.columns = [self._coerce(c) for c in self.columns]
        self.add_columns = [self._coerce(c) for c in self.add_columns]
        self.drop_columns = [self._coerce(c) for c in self.drop_columns]
        self.json_columns = tuple(self.json_columns)
        # NOTE: columns/drop_columns exclusivity (validate()) is checked at
        # plan time like the reference's configure() — transaction-only,
        # ColumnFilterPlugin.java:129 — not at construction, so rule-tree
        # precedence (drop overcomes keep) stays testable standalone.

    @staticmethod
    def _coerce(c) -> ColumnRule:
        return c if isinstance(c, ColumnRule) else ColumnRule.from_dict(c)

    def validate(self) -> None:
        # reference: ColumnFilterPlugin.configure, :135-140
        if self.columns and self.drop_columns:
            raise ConfigError(
                'Either of "columns", "drop_columns" can be specified.')

    @classmethod
    def from_dict(cls, d: dict) -> "FilterConfig":
        d = dict(d)
        d.pop("type", None)  # embulk yaml carries `type: column`
        kwargs = {}
        for k in ("columns", "add_columns", "drop_columns"):
            if k in d:
                kwargs[k] = d.pop(k)
        for yaml_key, attr in (
                ("default_timestamp_format", "default_timestamp_format"),
                ("default_timezone", "default_timezone"),
                ("default_date", "default_date"),
                ("json_columns", "json_columns")):
            if yaml_key in d:
                kwargs[attr] = d.pop(yaml_key)
        if d:
            raise ConfigError("unknown filter config keys: %s" % sorted(d))
        return cls(**kwargs)
