"""Custom stateful streaming operator: per-key event-time sessionization
over the CDC stream (``applyInPandasWithState``).

Groups a key's events into sessions separated by an event-time gap >
``gap``; a closed session is emitted as one row (key, start, end,
n_events). The open tail session lives in keyed state across
micro-batches — the canonical "built-in operators can't express it"
case (SURVEY.md §2.3: custom stateful operator seam): Spark's built-in
``session_window`` aggregate covers windowed counts, but arbitrary
per-session payloads/logic (here: first/last/count fold, extendable to
e.g. per-session content hashes) need user state.

State bounds at 10^10 events: one open-session row per ACTIVE key;
production runs set an event-time watermark + ``EventTimeTimeout`` so
idle keys' state is evicted and their tail session flushes. The sandbox
tests drain with availableNow and NoTimeout (deterministic), asserting
the closed-session stream against a batch pandas oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType([
    T.StructField("key", T.StringType()),
    T.StructField("session_start_us", T.LongType()),
    T.StructField("session_end_us", T.LongType()),
    T.StructField("n_events", T.LongType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("start_us", T.LongType()),
    T.StructField("last_us", T.LongType()),
    T.StructField("n", T.LongType()),
])


_SESSION_COLS = ["key", "session_start_us", "session_end_us", "n_events"]


def _fold_sessions(timestamps, gap_us: int, prior=None):
    """The single session fold shared by the streaming and batch twins:
    sorted ``timestamps`` extend/break sessions against optional
    ``prior`` open state (start, last, n). Returns (closed sessions as
    (start, last, n) tuples, open tail or None)."""
    closed = []
    start, last, n = prior if prior is not None else (None, None, None)
    for ts in sorted(int(t) for t in timestamps):
        if start is None:
            start, last, n = ts, ts, 1
        elif ts - last > gap_us:
            closed.append((start, last, n))
            start, last, n = ts, ts, 1
        else:
            last = max(last, ts)
            n += 1
    return closed, (None if start is None else (start, last, n))


def _session_fn(gap_us: int, event_time_timeout: bool):
    import pandas as pd

    def fn(key, pdf_iter, state: GroupState):
        if event_time_timeout and state.hasTimedOut:
            # watermark passed last+gap: the open tail can never extend —
            # flush it and evict the key's state (bounded state at scale)
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame([(key[0], start, last, n)],
                               columns=_SESSION_COLS)
            return
        prior = tuple(state.get) if state.exists else None
        # drain ALL Arrow chunks before folding: a group larger than the
        # Arrow batch size arrives as multiple chunks, and a per-chunk
        # fold would process timestamps out of global order
        ts_all = []
        for pdf in pdf_iter:
            ts_all.extend(int(t) for t in pdf["ts_us"])
        closed, tail = _fold_sessions(ts_all, gap_us, prior)
        if tail is not None:
            state.update(tail)
            if event_time_timeout:
                state.setTimeoutTimestamp((tail[1] + gap_us) // 1000 + 1)
        yield pd.DataFrame([(key[0], s, e, n) for s, e, n in closed],
                           columns=_SESSION_COLS)

    return fn


def sessionize_batch(events: DataFrame, key: str = "url",
                     ts_col: str = "warc_ts", gap_seconds: float = 3600.0
                     ) -> DataFrame:
    """Batch twin of ``sessionize`` (same fold, ``applyInPandas``): all
    sessions are emitted, including each key's open tail — a bounded
    input has no notion of 'still open'. SQL-expressible (lag/sum window
    + group), so it carries the family's DuckDB oracle; the streaming
    variant shares the session semantics and is pinned by the
    cross-micro-batch pytest."""
    import pandas as pd

    from pyspark.sql import functions as F

    gap_us = int(gap_seconds * 1_000_000)

    def fn(pdf):
        out = []
        for k, grp in pdf.groupby("key"):
            closed, tail = _fold_sessions(grp["ts_us"], gap_us)
            out.extend((k, s, e, n) for s, e, n in closed)
            if tail is not None:
                out.append((k, *tail))
        return pd.DataFrame(out, columns=_SESSION_COLS)

    prepared = events.select(
        F.col(key).cast("string").alias("key"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"))
    return prepared.groupBy("key").applyInPandas(fn, SESSION_SCHEMA)


def sessionize(events: DataFrame, key: str = "url",
               ts_col: str = "warc_ts", gap_seconds: float = 3600.0,
               watermark_delay: str | None = None) -> DataFrame:
    """Closed sessions per key over a streaming DataFrame. Events within
    ``gap_seconds`` of the previous event (event time) extend the
    session; a larger gap closes it.

    Without a watermark, the open tail session is retained in state
    forever (fine for bounded replays). With ``watermark_delay`` (e.g.
    ``"1 hour"``), the input carries ``withWatermark`` and keyed state
    uses EventTimeTimeout: once the watermark passes a tail session's
    last event + gap, the tail is FLUSHED as a closed session and the
    key's state is evicted — state size is then bounded by the number of
    keys active inside the watermark horizon, the production
    configuration at 10^10 events."""
    from pyspark.sql import functions as F

    gap_us = int(gap_seconds * 1_000_000)
    with_ts = events.withColumn("_event_ts",
                                F.col(ts_col).cast("timestamp"))
    if watermark_delay is not None:
        with_ts = with_ts.withWatermark("_event_ts", watermark_delay)
    prepared = with_ts.select(
        F.col(key).cast("string").alias("key"),
        F.unix_micros(F.col("_event_ts")).alias("ts_us"),
        "_event_ts")
    timeout = GroupStateTimeout.EventTimeTimeout \
        if watermark_delay is not None else GroupStateTimeout.NoTimeout
    return (prepared.groupBy("key")
            .applyInPandasWithState(
                _session_fn(gap_us, watermark_delay is not None),
                outputStructType=SESSION_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=timeout))
