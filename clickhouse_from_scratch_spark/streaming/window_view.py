"""CREATE WINDOW VIEW — windowed streaming aggregation with watermarks.

Reference: ``src/Parsers/ParserCreateQuery.cpp:819-965`` — grammar
``CREATE WINDOW VIEW wv [TO tbl] [WATERMARK = STRICTLY_ASCENDING |
ASCENDING | INTERVAL ...] [ALLOWED_LATENESS = INTERVAL ...] AS SELECT ...
GROUP BY tumble/hop(ts, interval...)`` (WATERMARK :903-917,
LATENESS :919-926).

Mapping (SURVEY.md §2.9): tumble(ts, w) → ``window(ts, w)``;
hop(ts, slide, size) → ``window(ts, size, slide)``; WATERMARK/LATENESS →
``withWatermark``; TO tbl → ``writeStream.toTable``/memory sink.
Structured Streaming's update/append modes give the same late-row
semantics (late beyond watermark dropped).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def tumble(ts: str | Column, size: str) -> Column:
    """ClickHouse ``tumble(ts, INTERVAL w)`` → Spark tumbling window."""
    return F.window(ts if isinstance(ts, Column) else F.col(ts), size)


def hop(ts: str | Column, slide: str, size: str) -> Column:
    """ClickHouse ``hop(ts, INTERVAL slide, INTERVAL size)`` → sliding
    window. NOTE argument order: CH is (ts, slide, size); Spark's is
    (ts, size, slide)."""
    return F.window(ts if isinstance(ts, Column) else F.col(ts), size, slide)


class WindowView:
    """A windowed streaming aggregation (WINDOW VIEW) definition.

    ``build`` returns the streaming DataFrame (watermark + window groupBy);
    ``start`` runs it into a named in-memory sink — the local-testable
    analogue of ``TO tbl`` (use ``.writeStream.toTable`` on a real
    catalog).
    """

    def __init__(self, name: str, ts_col: str, window_col: Column,
                 keys: Sequence[str], aggs: Sequence[Column],
                 watermark: str = "0 seconds",
                 allowed_lateness: str | None = None) -> None:
        self.name = name
        self.ts_col = ts_col
        self.window_col = window_col
        self.keys = list(keys)
        self.aggs = list(aggs)
        # ALLOWED_LATENESS extends the watermark delay (CH: rows later
        # than watermark+lateness are discarded).
        self.delay = allowed_lateness if allowed_lateness else watermark

    def build(self, stream: DataFrame) -> DataFrame:
        return (stream
                .withWatermark(self.ts_col, self.delay)
                .groupBy(self.window_col.alias("w"), *self.keys)
                .agg(*self.aggs)
                .withColumn("window_start", F.col("w.start"))
                .withColumn("window_end", F.col("w.end"))
                .drop("w"))

    def start(self, stream: DataFrame,
              output_mode: str = "append") -> StreamingQuery:
        return (self.build(stream)
                .writeStream.outputMode(output_mode)
                .format("memory").queryName(self.name).start())
