"""Domain-level crawl curation: the triage step every web-scale corpus
build runs between raw crawl and training set (C4's blocklist pass,
RefinedWeb/FineWeb's per-domain quality gating, Gopher's source mixing).

Two primitives over a url-bearing corpus:

* ``domain_stats`` — one map-side-combining aggregation producing the
  per-domain scorecard (doc count, distinct urls, mean token count,
  optional mean of a caller-provided quality column) that a curator
  ranks/thresholds to build block- and allow-lists. One shuffle keyed
  by domain; no windows, no collects — the 100 TB plan is the obvious
  one and Spark already picks it.
* ``filter_domains`` — apply such a list: a broadcast ``isin`` filter
  for in-memory lists (pushes into the scan), a broadcast semi/anti
  join for DataFrame-shaped lists (a blocklist can be millions of
  domains — PhishTank-scale — but still MBs: always broadcastable,
  never a corpus shuffle).

Reference scope note: the reference plugin (embulk-filter-column) has
no crawl curation — this module is part of the engine's training-data
generalization (SURVEY.md §2.7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import tokens
from ..functions.web import url_domain


def domain_stats(df: DataFrame, url_col: str = "url",
                 text_col: str | None = "text",
                 quality_col: str | None = None) -> DataFrame:
    """Per-domain curation scorecard: ``(domain, n_docs, n_urls,
    mean_tokens[, mean_quality])``. ``domain`` comes from
    ``functions.web.url_domain`` (scheme-less / unparseable urls group
    under ``''`` — surfaced, not dropped, so dirty keys are visible to
    the curator). ``mean_tokens`` uses the engine's whitespace
    tokenizer over ``text_col``; pass ``text_col=None`` to skip the
    tokenization. ``quality_col`` averages any caller-computed score
    (e.g. ``functions.text.quality_score``) in the same pass.

    Aggregates are all partial-aggregatable (count / count distinct /
    avg): one shuffle on ``domain``, map-side combine everywhere —
    safe at any corpus size and any domain skew (a hot domain only
    concentrates its post-combine partials, one row per map task)."""
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.col(url_col)).alias("n_urls"),
    ]
    if text_col is not None:
        aggs.append(F.round(F.avg(F.size(tokens(F.col(text_col)))), 4)
                    .alias("mean_tokens"))
    if quality_col is not None:
        aggs.append(F.round(F.avg(F.col(quality_col)), 4)
                    .alias("mean_quality"))
    return (df.groupBy(url_domain(F.col(url_col)).alias("domain"))
            .agg(*aggs))


def filter_urls(df: DataFrame, patterns, url_col: str = "url",
                mode: str = "block") -> DataFrame:
    """URL-pattern filter — the C4-style companion to
    ``filter_domains`` for path/query-level rules (spam path tokens,
    session-id parameters, calendar/pagination traps). ``patterns``
    is an iterable of regexes OR-ed into one predicate;
    ``mode="block"`` drops matching rows, ``mode="allow"`` keeps only
    them. One native ``rlike`` in the scan stage — no join, no
    shuffle, no Python. Patterns should stick to the regex subset
    shared by Java regex and RE2 (no lookaround/backreferences) so
    the operator stays oracle-twinnable, same contract as the PII
    patterns."""
    if mode not in ("block", "allow"):
        raise ValueError("mode must be 'block' or 'allow'")
    pats = [p for p in patterns]
    if not pats:
        raise ValueError("patterns must be non-empty")
    combined = "|".join(f"(?:{p})" for p in pats)
    hit = F.col(url_col).rlike(combined)
    # NULL urls match nothing: blocked mode keeps them (~NULL is NULL →
    # filtered...) — make the policy explicit instead of NULL-luck
    hit = F.coalesce(hit, F.lit(False))
    return df.where(~hit if mode == "block" else hit)


def filter_domains(df: DataFrame, blocklist=None, allowlist=None,
                   url_col: str = "url") -> DataFrame:
    """Keep rows by domain membership: drop rows whose domain is in
    ``blocklist``, or (exclusively) keep only rows whose domain is in
    ``allowlist``. Exactly one of the two must be given.

    Each list is either an in-memory iterable of domain strings — an
    ``isin`` predicate, folded into the scan by Catalyst — or a
    single-column DataFrame of domains, applied as a BROADCAST
    anti/semi join (domain lists are MBs even at millions of entries;
    broadcasting keeps the corpus un-shuffled at any scale)."""
    if (blocklist is None) == (allowlist is None):
        raise ValueError("pass exactly one of blocklist / allowlist")
    dom = url_domain(F.col(url_col))
    ref, how = ((blocklist, "left_anti") if blocklist is not None
                else (allowlist, "left_semi"))
    if isinstance(ref, DataFrame):
        ref_col = ref.columns[0]
        return (df.withColumn("__domain", dom)
                .join(F.broadcast(ref.selectExpr(
                    f"`{ref_col}` AS __domain").distinct()),
                    "__domain", how)
                .drop("__domain"))
    domains = sorted(set(ref))
    pred: Column = dom.isin(domains) if domains else F.lit(False)
    return df.where(~pred if how == "left_anti" else pred)
