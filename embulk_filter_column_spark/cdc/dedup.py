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
