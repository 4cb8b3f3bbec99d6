"""Session windows: gap-based grouping, streaming and batch.

Two implementations of the same semantics:

- ``SessionView`` — declarative ``F.session_window(ts, gap)`` groupBy;
  Spark manages the session state, watermark closes sessions. This is
  the scale path (JVM state store, no Python in the loop).
- ``stateful_sessionize`` — ``applyInPandasWithState`` custom stateful
  operator: per-key session accumulation with explicit GroupState,
  emitting each session as it closes. The template for stateful logic
  Spark's built-ins can't express (reference WINDOW VIEW has no session
  windows; this goes beyond it).

A session covers rows where consecutive event gaps are <= the gap;
``session.end`` is last event + gap (Spark's convention).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def session_window(ts: str | Column, gap: str) -> Column:
    """Gap-based session window (batch or streaming)."""
    return F.session_window(ts if isinstance(ts, Column) else F.col(ts), gap)


class SessionView:
    """WINDOW VIEW analogue over session windows (declarative path)."""

    def __init__(self, name: str, ts_col: str, gap: str,
                 keys: Sequence[str], aggs: Sequence[Column],
                 watermark: str = "0 seconds") -> None:
        self.name = name
        self.ts_col = ts_col
        self.gap = gap
        self.keys = list(keys)
        self.aggs = list(aggs)
        self.watermark = watermark

    def build(self, stream: DataFrame) -> DataFrame:
        return (stream
                .withWatermark(self.ts_col, self.watermark)
                .groupBy(session_window(self.ts_col, self.gap).alias("w"),
                         *self.keys)
                .agg(*self.aggs)
                .withColumn("session_start", F.col("w.start"))
                .withColumn("session_end", F.col("w.end"))
                .drop("w"))

    def start(self, stream: DataFrame,
              output_mode: str = "append") -> StreamingQuery:
        return (self.build(stream)
                .writeStream.outputMode(output_mode)
                .format("memory").queryName(self.name).start())


def stateful_sessionize(stream: DataFrame, key_col: str = "user_id",
                        ts_col: str = "ts",
                        gap_seconds: int = 1800) -> DataFrame:
    """Custom stateful sessionization via ``applyInPandasWithState``.

    Per key, accumulate the open session in GroupState (start, last, n);
    a row arriving more than ``gap_seconds`` after the last closes the
    session and emits it. The open session survives across micro-batches
    in the state store. Emits (key, session_start, session_end, n_events)
    where session_end is last event + gap, matching ``session_window``.
    """
    out_schema = (f"{key_col} long, session_start timestamp, "
                  f"session_end timestamp, n_events long")
    state_schema = "start double, last double, n long"

    def fn(key, pdfs, state):
        import pandas as pd
        ts: list = []
        for pdf in pdfs:
            ts.extend(t.timestamp() for t in pdf[ts_col])
        ts.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        closed: list[tuple] = []
        for e in ts:
            if last is None:
                start, last, n = e, e, 1
            elif e - last <= gap_seconds:
                last, n = e, n + 1
            else:
                closed.append((start, last, n))
                start, last, n = e, e, 1
        if last is not None:
            state.update((float(start), float(last), n))
        rows = [(key[0],
                 pd.Timestamp(s, unit="s"),
                 pd.Timestamp(e + gap_seconds, unit="s"),
                 c) for s, e, c in closed]
        yield pd.DataFrame(
            rows, columns=[key_col, "session_start", "session_end",
                           "n_events"])

    return stream.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", "NoTimeout")
