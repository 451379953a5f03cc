"""Corpus management for training pipelines: deterministic splits,
global shuffle, stratified mixture sampling.

All three are driven by one HASH-derived uniform, not by Spark's
sample()/sampleBy(): Bernoulli sampling is seeded per-partition, so
its membership changes whenever the input's partitioning changes — a
repartitioned rerun of a 10^10-row corpus would silently produce a
different train set. The hash unit ``u(id) = int(md5(id || '#' ||
seed)[:8hex]) / 2^32`` depends only on the row's id and the seed:
membership is reproducible across runs, layouts, and engines (md5 is
bit-identical in Spark and DuckDB, which is what makes every operator
here oracle-checkable in plain SQL — xxhash64 exists only on the
Spark side).

* ``split_corpus`` — train/val/test assignment by cumulative weight
  boundaries over u(id). Pure projection: no shuffle, no state; a doc
  keeps its split forever, new docs land proportionally.
* ``shuffle_corpus`` — the pre-training global shuffle: order by
  (u(id), id). Spark executes the orderBy as a range-partitioned
  distributed sort (sampled boundaries, no single-partition stage);
  downstream writers preserve the order per partition file.
* ``sample_corpus_stratified`` — mixture weighting: keep a row iff
  u(id) < fraction(stratum) — exact deterministic per-stratum rates
  for up/down-weighting sources or languages. Pure filter; Catalyst
  pushes it into the scan.

NULL ids have no hash, hence no deterministic membership — all three
operators treat them the SAME way (ADVICE r4: split used to silently
dump them into the last-named split while sample dropped them):
``split_corpus`` assigns a NULL split, ``sample_corpus_stratified``
excludes the row, and ``shuffle_corpus`` gives a NULL key (Spark
orders NULLS FIRST ascending, so they group at the front — audit or
filter them there). A corpus with NULL doc ids should be repaired
upstream; these operators just refuse to invent membership for it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 8 hex chars → [0, 2^32); dividing maps to [0, 1) exactly in a double
_UNIT_DENOM = float(1 << 32)


def unit_hash(col, seed: int = 42) -> F.Column:
    """Uniform [0, 1) derived from md5(id || '#' || seed) — layout- and
    engine-independent. SQL twin: ``unit_hash_sql``."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(
        F.md5(F.concat(c.cast("string"), F.lit(f"#{seed}"))), 1, 8),
        16, 10).cast("long")
    return h / F.lit(_UNIT_DENOM)


def unit_hash_sql(expr: str, seed: int = 42) -> str:
    """DuckDB twin of ``unit_hash`` (bit-identical md5, same hex slice,
    same 2^32 divisor)."""
    return ("CAST(('0x' || substring(md5(CAST(%s AS VARCHAR) || '#%d'),"
            " 1, 8)) AS BIGINT) / 4294967296.0" % (expr, seed))


def split_corpus(df: DataFrame, weights: dict | None = None,
                 id_col: str = "doc_id", seed: int = 42,
                 split_col: str = "split") -> DataFrame:
    """Append ``split_col`` assigning each row to a named split with
    probability proportional to its weight (weights are normalized).
    Deterministic in (id, seed) only — stable across reruns,
    repartitions, and incremental corpus growth. Rows with a NULL id
    get a NULL split (no hash → no membership; see module docstring)."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative and non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    u = unit_hash(id_col, seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        clause = F.when(u < F.lit(acc), F.lit(name))
        expr = clause if expr is None else expr.when(u < F.lit(acc),
                                                    F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    # NULL id → NULL u → every when-condition NULL → the otherwise()
    # branch: a NULL-id row would silently land in the LAST split — gate
    # the whole expression on the id instead (consistent with sample's
    # exclusion; ADVICE r4)
    expr = F.when(F.col(id_col).isNotNull(), expr)
    return df.withColumn(split_col, expr)


def shuffle_corpus(df: DataFrame, id_col: str = "doc_id",
                   seed: int = 42,
                   key_col: str = "shuffle_key") -> DataFrame:
    """Globally shuffle the corpus into a reproducible pseudorandom
    order: sort by (u(id), id). The orderBy compiles to a
    range-partitioned distributed sort — sampled range boundaries, all
    partitions sort in parallel, no single-partition window. The sort
    key is kept as ``key_col`` so the order is auditable (and
    oracle-checkable) downstream."""
    out = df.withColumn(key_col, unit_hash(id_col, seed))
    return out.orderBy(F.col(key_col), F.col(id_col))


def sample_corpus_stratified(df: DataFrame, strata_col: str,
                             fractions: dict,
                             id_col: str = "doc_id", seed: int = 42,
                             default_fraction: float = 0.0
                             ) -> DataFrame:
    """Keep each row iff u(id) < fraction(stratum) — exact
    deterministic per-stratum sampling for mixture weighting
    (up/down-weight sources, languages, quality tiers). Strata absent
    from ``fractions`` keep ``default_fraction``. Unlike
    ``df.sampleBy``, membership is independent of partitioning and
    reproducible across engines. NULL-id rows are excluded (NULL hash
    fails every comparison — the documented NULL policy, see module
    docstring)."""
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0, 1]")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError("default_fraction must be in [0, 1]")
    u = unit_hash(id_col, seed)
    frac = None
    for k, v in fractions.items():
        clause = F.when(F.col(strata_col) == F.lit(k), F.lit(float(v)))
        frac = clause if frac is None else frac.when(
            F.col(strata_col) == F.lit(k), F.lit(float(v)))
    frac = (F.lit(float(default_fraction)) if frac is None
            else frac.otherwise(F.lit(float(default_fraction))))
    return df.where(u < frac)


def plan_mixture(df: DataFrame, strata_col: str, weights: dict,
                 n_tokens_col: str | None = None,
                 text_col: str = "text") -> DataFrame:
    """Token-budget mixture planner: given target mixture ``weights``
    per stratum (source, language, quality tier), compute the
    per-stratum keep fractions that realize the LARGEST corpus with
    exactly that token mixture WITHOUT upsampling any stratum (no
    document is repeated — epochs are a training-loop decision, not a
    corpus-build one). Returns one row per target stratum:
    ``(strata_col, total_tokens, fraction)``, directly feedable to
    ``sample_corpus_stratified`` via ``mixture_fractions``.

    Closed form: with per-stratum token totals ``T_s`` and normalized
    weights ``w_s``, the binding stratum caps the achievable corpus at
    ``C = min_s T_s / w_s`` and every stratum keeps
    ``f_s = w_s * C / T_s`` (the binding stratum keeps 1.0). Token
    totals come from ``n_tokens_col`` when the pipeline already
    counted tokens, else from the engine's whitespace tokenizer over
    ``text_col`` — ONE map-side-combining aggregation over the corpus
    either way; the planning arithmetic is O(strata) on the driver.
    Strata absent from ``weights`` get no row (keep fraction 0 —
    excluded from the mixture); strata in ``weights`` but absent from
    the corpus yield total 0 and make the plan infeasible, surfaced
    as fraction NULL for every stratum."""
    from ..functions.text import tokens

    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be > 0")
    total_w = float(sum(weights.values()))
    norm = {k: float(v) / total_w for k, v in weights.items()}
    n_tok = (F.col(n_tokens_col) if n_tokens_col is not None
             else F.size(tokens(F.col(text_col))))
    totals = (df.where(F.col(strata_col).isin(*norm.keys()))
              .groupBy(strata_col)
              .agg(F.sum(n_tok).alias("total_tokens")))
    # ONE corpus scan: collect the O(strata) total rows, then the
    # closed-form arithmetic runs on the driver — no second/third
    # aggregation job, and the plan can't see data that changed
    # between jobs. A missing stratum, a NULL total (all-NULL
    # text/token column) or a zero total makes the mixture
    # infeasible: fraction NULL for EVERY stratum.
    rows = totals.collect()
    got = {r[strata_col]: r["total_tokens"] for r in rows}
    feasible = (len(got) == len(norm)
                and all(t is not None and t > 0 for t in got.values()))
    if feasible:
        cap = min(got[k] / norm[k] for k in norm)
        plan = [(k, int(got[k]), round(norm[k] * cap / got[k], 6))
                for k in sorted(norm)]
    else:
        plan = [(k, None if got.get(k) is None else int(got[k]), None)
                for k in sorted(got)]
    stratum_type = df.schema[strata_col].dataType.simpleString()
    return df.sparkSession.createDataFrame(
        plan, schema=(f"{strata_col} {stratum_type}, "
                      "total_tokens long, fraction double"))


def mixture_fractions(df: DataFrame, strata_col: str, weights: dict,
                      **kwargs) -> dict:
    """Collect ``plan_mixture`` into the dict
    ``sample_corpus_stratified`` takes; raises if infeasible."""
    rows = plan_mixture(df, strata_col, weights, **kwargs).collect()
    out = {r[strata_col]: r["fraction"] for r in rows}
    if len(out) != len(weights) or any(v is None for v in out.values()):
        raise ValueError(
            "mixture infeasible: a target stratum is missing or empty "
            f"(got totals for {sorted(out)})")
    return out
