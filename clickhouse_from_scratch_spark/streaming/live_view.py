"""CREATE LIVE VIEW / WATCH — continuously-updated materialized results.

Reference: ``src/Parsers/ParserCreateQuery.cpp:666-817`` (LIVE VIEW with
WITH TIMEOUT / WITH PERIODIC REFRESH at :687-688,717-736) and
``ParserWatchQuery.cpp`` (+ ``ASTWatchQuery.h:25-26`` for EVENTS/LIMIT).

Mapping: the LIVE VIEW is a streaming query maintaining a complete-mode
in-memory result; WATCH is a read of that sink; WATCH EVENTS is the
version counter (micro-batch id). ``INSERT INTO t WATCH lv``
(``ParserInsertQuery.cpp:165-172``) = `foreachBatch` append to a table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


class LiveView:
    """A continuously-refreshed materialization of a streaming aggregate.

    ``refresh_interval`` maps WITH PERIODIC REFRESH onto a processing-time
    trigger. The view name doubles as the memory-sink table, so
    ``watch()`` is just a SELECT against it.
    """

    def __init__(self, name: str, refresh_interval: str | None = None) -> None:
        self.name = name
        self.refresh_interval = refresh_interval
        self._query: StreamingQuery | None = None
        self._version = 0

    def create(self, aggregated_stream: DataFrame) -> StreamingQuery:
        writer = (aggregated_stream.writeStream
                  .outputMode("complete")
                  .format("memory").queryName(self.name))
        if self.refresh_interval:
            writer = writer.trigger(processingTime=self.refresh_interval)
        self._query = writer.start()
        return self._query

    def watch(self, spark: SparkSession) -> DataFrame:
        """WATCH lv — current state of the live view."""
        return spark.sql(f"SELECT * FROM {self.name}")

    def watch_events(self) -> int:
        """WATCH lv EVENTS — version heartbeat (last micro-batch id)."""
        if self._query is None:
            return 0
        progress = self._query.lastProgress
        return int(progress["batchId"]) if progress else 0

    def stop(self) -> None:
        if self._query is not None:
            self._query.stop()
            self._query = None
