"""Webtext primitives: HTML → visible text extraction, fully native
(JVM regex + chained replaces — no Python in the plan).

The north star's input table carries ``html: binary`` next to the
extracted ``text``; this is the extraction seam. The implementation is
a deliberate heuristic (production pipelines plug a real parser like
trafilatura behind the same column contract — see the multimodal
decoder seam for the pattern): strip non-content elements, drop tags,
decode the common entities, collapse whitespace. Every step is
expressible in ANSI-SQL regexp_replace/replace, so the operator is
DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# entity → character, applied in this order (amp last, so '&amp;lt;'
# decodes to '&lt;' not '<' — the standard single-pass rule)
ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)

# non-content elements whose inner text must vanish entirely
_DROP_ELEMENTS = ("script", "style", "noscript")


def extract_text(col) -> Column:
    """Visible text of an HTML document (string or binary column — the
    input_hint's html column is binary; cast(binary as string) is
    Spark's UTF-8 interpretation)."""
    c = F.col(col) if isinstance(col, str) else col
    c = c.cast("string")
    for el in _DROP_ELEMENTS:
        c = F.regexp_replace(
            c, r"(?is)<%s\b[^>]*>.*?</%s>" % (el, el), " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")   # comments
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")      # any tag
    for ent, ch in ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def extract_text_sql(expr: str) -> str:
    """The DuckDB twin of extract_text over a VARCHAR expression —
    keeps the oracle in lockstep with the Spark implementation."""
    out = expr
    for el in _DROP_ELEMENTS:
        out = ("regexp_replace(%s, '(?is)<%s\\b[^>]*>.*?</%s>', ' ', 'g')"
               % (out, el, el))
    out = "regexp_replace(%s, '(?s)<!--.*?-->', ' ', 'g')" % out
    out = "regexp_replace(%s, '(?s)<[^>]*>', ' ', 'g')" % out
    for ent, ch in ENTITIES:
        out = "replace(%s, '%s', '%s')" % (out, ent, ch.replace("'", "''"))
    return "trim(regexp_replace(%s, '\\s+', ' ', 'g'))" % out
