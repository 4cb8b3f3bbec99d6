"""Structured Streaming surface: WINDOW VIEW (tumble/hop) + LIVE VIEW."""

from __future__ import annotations

import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_from_scratch_spark.streaming import LiveView, WindowView, hop, tumble

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
])


def _event_stream(spark, tmp_path):
    # batch of rows driven through a real file-source streaming query
    rows = [(i, f"2024-01-01 00:{i:02d}:00", i % 3, "click", float(i))
            for i in range(30)]
    df = spark.createDataFrame(rows, "event_id long, ts string, user_id long,"
                               " event_type string, value double") \
        .withColumn("ts", F.to_timestamp("ts"))
    path = str(tmp_path / "stream_src")
    df.write.mode("overwrite").parquet(path)
    return spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double").parquet(path)


def test_window_view_tumble(spark, tmp_path):
    stream = _event_stream(spark, tmp_path)
    wv = WindowView("wv_tumble_test", "ts", tumble("ts", "10 minutes"),
                    keys=["user_id"],
                    aggs=[F.count(F.lit(1)).alias("n"),
                          F.sum("value").alias("total")],
                    watermark="5 minutes")
    q = wv.start(stream, output_mode="append")
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT * FROM wv_tumble_test")
        rows = out.collect()
        # 30 minutes of events in 10-min tumbling windows × 3 users;
        # append mode emits only watermark-closed windows
        assert set(out.columns) == {"window_start", "window_end",
                                    "user_id", "n", "total"}
        assert len(rows) >= 6
        assert all(r.n > 0 for r in rows)
    finally:
        q.stop()


def test_window_view_hop(spark, tmp_path):
    stream = _event_stream(spark, tmp_path)
    wv = WindowView("wv_hop_test", "ts",
                    hop("ts", slide="5 minutes", size="10 minutes"),
                    keys=[], aggs=[F.count(F.lit(1)).alias("n")],
                    watermark="0 seconds")
    q = wv.start(stream, output_mode="append")
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM wv_hop_test").collect()
        # hopping windows overlap → each event lands in 2 windows
        assert sum(r.n for r in rows) >= 30
    finally:
        q.stop()


def test_live_view_watch(spark, tmp_path):
    stream = _event_stream(spark, tmp_path)
    agg = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    lv = LiveView("lv_test")
    q = lv.create(agg)
    try:
        q.processAllAvailable()
        got = lv.watch(spark).collect()
        assert got and got[0].n == 30           # complete-mode current state
        assert lv.watch_events() >= 0           # version heartbeat
    finally:
        lv.stop()
