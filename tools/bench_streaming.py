#!/usr/bin/env python
"""Steady-state micro-bench for the streaming operators (VERDICT r13
item 6 — they had zero perf coverage).

Feeds each operator a deterministic ``rate-micro-batch`` source
(fixed rows per micro-batch) into a streaming noop sink, lets it run a
fixed number of micro-batches, and reports the steady-state batch
duration and rows/sec from the query's own progress events (median of
the post-warmup batches).

Usage: python tools/bench_streaming.py [--rows-per-batch 100000]
                                       [--batches 12] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from clickhouse_from_scratch_spark.session import get_spark  # noqa: E402


def rate_docs(spark, rows_per_batch: int) -> DataFrame:
    """Deterministic micro-batch stream shaped like the documents table:
    (doc_id, ts, text) with ~10% near-duplicate rows (value % 10 == 0
    repeats the same boilerplate) so dedup state does real work."""
    src = (spark.readStream.format("rate-micro-batch")
           .option("rowsPerBatch", rows_per_batch)
           .option("numPartitions", 8)
           .option("startTimestamp", 0)
           .load())                      # columns: timestamp, value
    return src.selectExpr(
        "value AS doc_id",
        "timestamp AS ts",
        "CASE WHEN value % 10 = 0 THEN 'common boilerplate header line' "
        "ELSE concat('document body number ', value, "
        "' with distinct words ', value % 7, ' ', value % 13) END AS text")


def run(name: str, out: DataFrame, batches: int,
        output_mode: str = "append") -> dict:
    q = (out.writeStream.outputMode(output_mode)
         .format("noop").queryName(name)
         .option("checkpointLocation",
                 f"/tmp/bench_streaming_ckpt/{name}-{os.getpid()}")
         .start())
    try:
        deadline = time.time() + 300
        while len(q.recentProgress) < batches and time.time() < deadline:
            time.sleep(0.5)
        prog = list(q.recentProgress)
    finally:
        q.stop()
    # skip warmup batches (JIT, state-store open); empty batches carry
    # no rows — drop them from the rate calc
    useful = [p for p in prog[2:] if p["numInputRows"] > 0]
    durs = [p["batchDuration"] for p in useful]
    rates = [p["numInputRows"] / (p["batchDuration"] / 1000.0)
             for p in useful]
    res = {
        "batches": len(useful),
        "batch_ms_median": round(statistics.median(durs), 1) if durs else None,
        "rows_per_sec_median": round(statistics.median(rates)) if rates else None,
    }
    print(f"{name:<28} batches={res['batches']:<3} "
          f"median_batch={res['batch_ms_median']}ms "
          f"rows/s={res['rows_per_sec_median']}")
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-per-batch", type=int, default=100_000)
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    spark = get_spark("bench_streaming")
    from clickhouse_from_scratch_spark.streaming.dedup import (
        streaming_exact_dedup, streaming_minhash_signatures)
    from clickhouse_from_scratch_spark.streaming.session_view import (
        SessionView, session_window)
    from clickhouse_from_scratch_spark.streaming.window_view import (
        WindowView, tumble)

    docs = rate_docs(spark, args.rows_per_batch)
    results = {}

    results["exact_dedup_watermark"] = run(
        "exact_dedup_watermark",
        streaming_exact_dedup(docs, ts_col="ts", watermark="10 seconds"),
        args.batches)

    results["minhash_signatures"] = run(
        "minhash_signatures",
        streaming_minhash_signatures(docs),
        args.batches)

    wv = WindowView("wv_bench", "ts", tumble("ts", "5 seconds"),
                    keys=[], aggs=[F.count(F.lit(1)).alias("n"),
                                   F.sum("doc_id").alias("s")],
                    watermark="5 seconds")
    results["window_view_tumble"] = run(
        "window_view_tumble", wv.build(docs), args.batches)

    sv = SessionView("sv_bench", "ts", "3 seconds",
                     keys=[(F.col("doc_id") % 100).alias("user")],
                     aggs=[F.count(F.lit(1)).alias("n")],
                     watermark="5 seconds")
    results["session_view"] = run(
        "session_view", sv.build(docs), args.batches)

    # live view = complete-mode keyless aggregate over the stream
    live = docs.groupBy().agg(F.count(F.lit(1)).alias("n"),
                              F.sum("doc_id").alias("s"))
    results["live_view_complete_agg"] = run(
        "live_view_complete_agg", live, args.batches,
        output_mode="complete")

    results["_config"] = {"rows_per_batch": args.rows_per_batch,
                          "batches": args.batches,
                          "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32")}
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.json}")
    spark.stop()


if __name__ == "__main__":
    main()
