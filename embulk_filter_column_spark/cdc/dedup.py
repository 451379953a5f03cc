"""Last-writer-wins dedup (SURVEY.md §2.3).

Implemented as ``groupBy(key).agg(max_by(payload_struct, order_struct))``
rather than a window + row_number: max_by is an ordinary aggregate, so
Spark performs **map-side partial aggregation** — each task reduces its
local duplicates before the shuffle. A hot url with millions of updates in
one batch collapses to one row per map task, which is the skew defense a
window (full shuffle of every duplicate to one partition, then sort) does
not have. AQE skew-join/partition splitting covers the residue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def last_writer_wins(df: DataFrame, key: str = "url",
                     order: tuple = ("warc_ts", "seq")) -> DataFrame:
    """One row per ``key`` — the one with the greatest ``order`` tuple.
    Column order of the result matches the input."""
    payload = [c for c in df.columns if c != key]
    winner = F.max_by(
        F.struct(*[F.col(c) for c in payload]),
        F.struct(*[F.col(c) for c in order]),
    ).alias("_w")
    out = df.groupBy(key).agg(winner)
    return out.select(key, *[F.col("_w." + c).alias(c) for c in payload]) \
        .select(*df.columns)


def salted_last_writer_wins(df: DataFrame, key: str = "url",
                            order: tuple = ("warc_ts", "seq"),
                            n_salts: int = 16) -> DataFrame:
    """Two-stage LWW for pathological key skew: shuffle 1 reduces on
    (key, salt) — a hot url fans out over ``n_salts`` reducers — then
    shuffle 2 reduces the ≤ n_salts per-salt winners per key.

    ``max_by``'s map-side partial aggregation already absorbs most skew
    (EXPLAIN.md), but when a single key's event volume exceeds what one
    reduce partition should hold (10^10-event replays with a viral-page
    url), the salt bounds any reduce task at ~1/n_salts of the hot key.
    The salt is derived from the event's ``order`` columns, so it is
    deterministic per event, uniform across a key's events, and needs
    no extra input column. Result is identical to last_writer_wins
    (max is associative) — pinned by test."""
    salt = F.pmod(
        F.xxhash64(*[F.col(c).cast("string") for c in order]),
        F.lit(n_salts))
    salted = df.withColumn("_salt", salt)
    payload = [c for c in df.columns if c != key]
    winner = F.max_by(
        F.struct(*[F.col(c) for c in payload]),
        F.struct(*[F.col(c) for c in order]),
    ).alias("_w")
    stage1 = (salted.groupBy(key, "_salt").agg(winner)
              .select(key, *[F.col("_w." + c).alias(c) for c in payload]))
    return last_writer_wins(stage1, key=key, order=order) \
        .select(*df.columns)


def hot_keys(df: DataFrame, key: str = "url", fraction: float = 0.01,
             min_share: float = 0.001, seed: int = 42) -> list:
    """Sampled hot-key detection: keys whose share of a ``fraction``
    sample exceeds ``min_share`` (the salting trigger — SURVEY.md §4).
    ONE job over the sample: the per-key counts and the sample total
    come out of the same aggregation (the total is a broadcast
    single-row cross join over the grouped counts, so the sample is
    scanned once); at 10^10 events a 1% sample's group count is still
    executor-side until the final filtered collect."""
    sample = df.sample(fraction=fraction, seed=seed)
    counts = sample.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("_total"))
    hot = (counts.crossJoin(F.broadcast(total))
           .where(F.col("n") >= F.greatest(
               (F.col("_total") * F.lit(min_share)).cast("long"),
               F.lit(1)))
           .select(key))
    return [r[0] for r in hot.collect()]
