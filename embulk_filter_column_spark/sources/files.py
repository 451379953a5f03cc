"""Embulk-style file input: the `in: {type: file, parser: {type: csv}}`
half of a reference pipeline, so a user's existing config
(example/example.yml, example/edgecase.yml) runs end-to-end on Spark:

    df = read_embulk_file(spark, "data.csv", parser_config)
    out = apply_filter(df, filter_config)

Supported parser options (reference: embulk-parser-csv used by every
example/ config): ``columns`` (name/type/format), ``delimiter``,
``quote``, ``escape``, ``null_string``, ``comment_line_marker``,
``skip_header_lines`` (any N — 0/1 map to Spark's native per-file
header skip; N > 1 trims each file's first N lines with a streamed
per-file text pre-pass), ``charset``,
``newline`` (informational — Spark auto-detects line endings).

Type mapping: long→bigint, double, string, boolean, timestamp (parsed
natively via to_timestamp with the column's Ruby-strftime format
translated to a Java pattern), json→string column carrying the engine's
json metadata marker (exactly what apply_filter expects).

The read is a plain ``spark.read.csv`` — distributed, splittable,
predicate/column pruning intact; nothing passes through Python.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..errors import ConfigError
from ..schema import JSON_META_KEY

# Ruby strftime → Java DateTimeFormatter fragments (the subset that maps
# 1:1; anything else falls back to the driver-side parse_strftime
# semantics being unavailable per-row → ConfigError, so misconfiguration
# fails loudly at plan time)
_STRF_TO_JAVA = {
    "Y": "yyyy", "y": "yy", "m": "MM", "d": "dd", "e": "d",
    "H": "HH", "k": "H", "I": "hh", "M": "mm", "S": "ss",
    "L": "SSS", "N": "SSSSSSSSS",
    "p": "a", "z": "XX", "Z": "zzz",
    "b": "MMM", "B": "MMMM", "a": "EEE", "A": "EEEE",
    "j": "DDD", "%": "%",
}

# the '-' (no-padding) flag needs the SINGLE-LETTER Java pattern:
# strict DateTimeFormatter fails on '5' against 'dd', and PERMISSIVE
# parse would silently null the timestamp instead
_STRF_UNPADDED = {
    "d": "d", "e": "d", "m": "M", "H": "H", "k": "H", "I": "h",
    "M": "m", "S": "s", "j": "D", "y": "y", "Y": "yyyy",
}


def strftime_to_java(fmt: str) -> str:
    """Translate a Ruby-strftime format to a Java DateTimeFormatter
    pattern (reference timestamp columns carry strftime formats)."""
    out = []
    i, n = 0, len(fmt)
    while i < n:
        ch = fmt[i]
        if ch == "%" and i + 1 < n:
            flag = None
            d = fmt[i + 1]
            if d in ("-", "0", "_", "^") and i + 2 < n:  # padding flags
                flag = d
                i += 1
                d = fmt[i + 1]
            if flag == "-":
                # unpadded values need the single-letter pattern; for
                # directives where '-' is a no-op (%-Y etc.) fall back
                frag = _STRF_UNPADDED.get(d, _STRF_TO_JAVA.get(d))
            elif flag in ("_", "^"):
                # space-padding / upcasing have no strict Java-pattern
                # equivalent — mistranslating would null timestamps in
                # PERMISSIVE mode, so reject loudly
                raise ConfigError(
                    "timestamp format flag %%%s%s in %r has no native "
                    "Spark pattern equivalent" % (flag, d, fmt))
            else:  # no flag, or '0' (zero padding — the Java default)
                frag = _STRF_TO_JAVA.get(d)
            if frag is None:
                raise ConfigError(
                    "timestamp format directive %%%s in %r has no native "
                    "Spark pattern equivalent" % (d, fmt))
            out.append(frag)
            i += 2
        elif ch in "'":
            out.append("''")
            i += 1
        elif ch.isalpha():
            out.append("'" + ch + "'")
            i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


_CSV_TYPES = {
    "string": T.StringType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
}


def _strip_header_lines(path: str, skip: int) -> str:
    """Stream-copy each matched file minus its first ``skip`` lines into
    a temp dir; returns the new glob root. Constant memory (line-by-line
    over the preamble, bulk copy after)."""
    import glob as _glob
    import shutil
    import tempfile

    matches = sorted(_glob.glob(path)) if any(
        ch in path for ch in "*?[") else [path]
    if not matches:
        raise ConfigError("no files match %r" % path)
    out_dir = tempfile.mkdtemp(prefix="efcs_skiphdr_")
    for i, f in enumerate(matches):
        dst = os.path.join(out_dir, "%05d_%s" % (i, os.path.basename(f)))
        with open(f, "rb") as src, open(dst, "wb") as out:
            for _ in range(skip):
                if not src.readline():
                    break
            shutil.copyfileobj(src, out)
    return out_dir


def read_embulk_file(spark: SparkSession, path: str,
                     parser: dict) -> DataFrame:
    """Read a CSV/TSV/JSONL file the way the reference's `file` input +
    `csv`/`jsonl` parser would, returning a DataFrame ready for
    apply_filter."""
    ptype = parser.get("type", "csv")
    if ptype in ("jsonl", "json"):
        return _read_jsonl(spark, path, parser)
    if ptype != "csv":
        raise ConfigError(
            "only the csv and jsonl parsers are implemented (got %r)"
            % ptype)
    columns = parser.get("columns") or []
    if not columns:
        raise ConfigError("parser.columns must be specified")

    skip = int(parser.get("skip_header_lines", 0))
    if skip > 1:
        # Spark's csv reader can only skip ONE header line natively.
        # Multi-line preambles (the reference skips N lines per file)
        # are handled by a streamed per-file trim into a temp dir —
        # O(file) sequential IO once, constant memory, then the
        # DISTRIBUTED reader takes over on the trimmed copies. The
        # reference's csv parser is a local-file plugin, so local
        # staging matches its deployment shape; lake-scale inputs use
        # the WAL/parquet path, not this reader.
        path = _strip_header_lines(path, skip)
        skip = 0

    delimiter = parser.get("delimiter", ",")
    delimiter = {"\\t": "\t"}.get(delimiter, delimiter)

    # read every non-json, non-timestamp column with its target type;
    # json + timestamp come in as strings and are refined below
    fields = []
    for c in columns:
        t = c.get("type", "string")
        if t in ("json", "timestamp"):
            dt = T.StringType()
        elif t in _CSV_TYPES:
            dt = _CSV_TYPES[t]
        else:
            raise ConfigError("unknown csv column type %r" % t)
        fields.append(T.StructField(c["name"], dt))

    reader = (spark.read
              .schema(T.StructType(fields))
              .option("header", str(skip == 1).lower())
              .option("sep", delimiter)
              .option("quote", parser.get("quote", '"'))
              .option("escape", parser.get("escape", "\\"))
              .option("mode", "PERMISSIVE"))
    if parser.get("null_string") is not None:
        reader = reader.option("nullValue", parser["null_string"])
    marker = parser.get("comment_line_marker")
    if marker:
        if len(marker) != 1:
            # Spark's csv comment option is single-character; silently
            # truncating "//" to "/" would drop legitimate rows
            raise ConfigError(
                "comment_line_marker must be a single character for the "
                "distributed csv reader (got %r)" % marker)
        reader = reader.option("comment", marker)
    if parser.get("charset"):
        reader = reader.option("encoding", parser["charset"])
    df = reader.csv(path)

    # refine timestamp columns (native to_timestamp, strftime translated)
    # and mark json columns with the engine's metadata marker
    exprs = []
    for c in columns:
        name, t = c["name"], c.get("type", "string")
        if t == "timestamp":
            pattern = strftime_to_java(c.get("format", "%Y-%m-%d %H:%M:%S"))
            exprs.append(F.to_timestamp(F.col(name), pattern).alias(name))
        elif t == "json":
            exprs.append(F.col(name).alias(
                name, metadata={JSON_META_KEY: "json"}))
        else:
            exprs.append(F.col(name))
    return df.select(*exprs)


def _read_jsonl(spark: SparkSession, path: str, parser: dict) -> DataFrame:
    """Embulk jsonl parser equivalent: one JSON object per line. With
    ``columns`` the schema is explicit (same type mapping as csv —
    timestamp columns parse their strftime format natively, json-typed
    columns stay as marked JSON-text strings); without, Spark infers.
    Distributed, splittable ``spark.read.json`` — no Python in the
    scan."""
    columns = parser.get("columns")
    if not columns:
        return spark.read.json(path)
    fields = []
    for c in columns:
        t = c.get("type", "string")
        if t in ("json", "timestamp"):
            dt = T.StringType()
        elif t in _CSV_TYPES:
            dt = _CSV_TYPES[t]
        else:
            raise ConfigError("unknown jsonl column type %r" % t)
        fields.append(T.StructField(c["name"], dt))
    df = spark.read.schema(T.StructType(fields)).json(path)
    exprs = []
    for c in columns:
        name, t = c["name"], c.get("type", "string")
        if t == "timestamp":
            pattern = strftime_to_java(c.get("format", "%Y-%m-%d %H:%M:%S"))
            exprs.append(F.to_timestamp(F.col(name), pattern).alias(name))
        elif t == "json":
            exprs.append(F.col(name).alias(
                name, metadata={JSON_META_KEY: "json"}))
        else:
            exprs.append(F.col(name))
    return df.select(*exprs)
