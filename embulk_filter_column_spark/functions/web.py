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


def normalize_url(col) -> Column:
    """Heuristic URL canonicalization — the key-normalization step
    before last-writer-wins keying on ``url`` (crawl logs carry the
    same page as Host-case/default-port/fragment/query-order variants,
    which would otherwise split a page's history across keys):

    * scheme and host lowercased
    * fragment stripped
    * default port stripped (:80 for http, :443 for https)
    * trailing slashes on the path collapsed ('' and '/' both → '')
    * query parameters sorted lexicographically (empty params dropped)

    Scheme-less inputs (no ``xyz://`` prefix) pass through unchanged:
    guessing a scheme would corrupt the LWW key ('://host/...' collides
    or splits histories), and a crawl log's non-URL keys (file paths,
    opaque ids) must stay stable.

    All native string/regex/array expressions; ``normalize_url_sql`` is
    the ANSI twin."""
    raw = F.trim(F.col(col) if isinstance(col, str) else col)
    u = F.regexp_replace(raw, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://",
                                      1))
    after = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(after, r"^([^/?]*)", 1))
    host = F.when(scheme == "http",
                  F.regexp_replace(hostport, r":80$", "")) \
            .when(scheme == "https",
                  F.regexp_replace(hostport, r":443$", "")) \
            .otherwise(hostport)
    rest = F.regexp_replace(after, r"^[^/?]*", "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    query = F.when(rest.contains("?"),
                   F.regexp_replace(rest, r"^[^?]*\?", "")) \
             .otherwise(F.lit(""))
    sorted_q = F.concat_ws(
        "&", F.array_sort(F.filter(F.split(query, "&"),
                                   lambda p: p != "")))
    normalized = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q))
         .otherwise(F.lit("")))
    return F.when(scheme == "", raw).otherwise(normalized)


def url_domain(col) -> Column:
    """Registrable-domain heuristic for crawl curation grouping:
    lowercased host with the port and a leading ``www.`` stripped.
    (True eTLD+1 needs the public-suffix list — a data file, not an
    algorithm; the www/port heuristic groups correctly for the
    overwhelming majority of crawl hosts without the dependency, and a
    PSL-aware variant can swap in behind the same column contract.)
    Scheme-less input yields ``''`` — same non-guessing stance as
    ``normalize_url``. Native regex; ``url_domain_sql`` is the twin."""
    c = F.col(col) if isinstance(col, str) else col
    # userinfo ('user:pass@host') is skipped greedily up to the last
    # '@' before the path — otherwise 'http://alice@blocked.com/' would
    # yield domain 'alice' and sail past a blocklist
    host = F.lower(F.regexp_extract(
        F.trim(c),
        r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?([^/?#:@]*)", 1))
    return F.regexp_replace(host, r"^www\.", "")


def url_domain_sql(expr: str) -> str:
    """DuckDB twin of url_domain (kept in lockstep)."""
    host = (f"lower(regexp_extract(trim({expr}), "
            f"'^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?([^/?#:@]*)', "
            f"1))")
    return f"regexp_replace({host}, '^www\\.', '')"


def normalize_url_sql(expr: str) -> str:
    """DuckDB twin of normalize_url (kept in lockstep)."""
    u = f"regexp_replace(trim({expr}), '#.*$', '')"
    scheme = f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    after = f"regexp_replace({u}, '^[A-Za-z][A-Za-z0-9+.-]*://', '')"
    hostport = f"lower(regexp_extract({after}, '^([^/?]*)', 1))"
    host = (f"CASE WHEN {scheme} = 'http' THEN "
            f"regexp_replace({hostport}, ':80$', '') "
            f"WHEN {scheme} = 'https' THEN "
            f"regexp_replace({hostport}, ':443$', '') "
            f"ELSE {hostport} END")
    rest = f"regexp_replace({after}, '^[^/?]*', '')"
    path = (f"regexp_replace(regexp_extract({rest}, '^([^?]*)', 1), "
            f"'/+$', '')")
    query = (f"CASE WHEN contains({rest}, '?') THEN "
             f"regexp_replace({rest}, '^[^?]*\\?', '') ELSE '' END")
    sorted_q = (f"array_to_string(list_sort(list_filter("
                f"string_split({query}, '&'), x -> x <> '')), '&')")
    normalized = (f"{scheme} || '://' || {host} || {path} || "
                  f"CASE WHEN {sorted_q} <> '' THEN '?' || {sorted_q} "
                  f"ELSE '' END")
    return (f"CASE WHEN {scheme} = '' THEN trim({expr}) "
            f"ELSE {normalized} END")
