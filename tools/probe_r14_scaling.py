#!/usr/bin/env python
"""VERDICT r13 item 4: demonstrate that the headline plans scale with
cores once scans actually have splits.

The driver's sf0.1 files are single row groups and even the split sf1
files get packed into ~128 MB splits (spark.sql.files.maxPartitionBytes
default — correct for real deployments, guide §6), so scans stay 1-3
tasks and the c8-vs-c32 bench mostly measures the per-stage scheduling
floor. This probe forces small splits (maxPartitionBytes) purely as a
DEMONSTRATION — the shipped session/bench config stays scale-neutral —
so the same physical plans run with 25-35 scan tasks, the way they
would at real scale where files are many x 128 MB.

Usage: python tools/probe_r14_scaling.py <cpus> [sf_dir]
           [max_partition_bytes] [query,query,...]
Prints one JSON line like bench.py (not a bench artifact).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else ".data/split-sf1"
    mpb = sys.argv[3] if len(sys.argv) > 3 else "6m"

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("probe_r14_scaling")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
             .config("spark.sql.adaptive.skewJoin.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.ansi.enabled", "false")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.driver.memory", "48g")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.autoBroadcastJoinThreshold",
                     str(64 * 1024 * 1024))
             .config("spark.sql.legacy.parquet.nanosAsLong", "true")
             .config("spark.sql.optimizer.windowGroupLimitThreshold",
                     str(1 << 20))
             .config("spark.python.sql.dataFrameDebugging.enabled", "false")
             # the demonstration knob: real-scale-like scan splitting
             .config("spark.sql.files.maxPartitionBytes", mpb)
             .config("spark.sql.files.openCostInBytes", "0")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    from clickhouse_from_scratch_spark.queries import QUERIES
    from bench import HEADLINE
    if len(sys.argv) > 4:
        HEADLINE = sys.argv[4].split(",")

    # the noop sink computes EVERY column (guide §1.4) — count() prunes
    # aggregate values, leaving sub-100ms stage floors that no core
    # count can speed up; scaling is about the actual compute
    for name in HEADLINE:
        QUERIES[name](spark, sf_dir) \
            .write.format("noop").mode("overwrite").save()

    times = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir) \
                .write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)
    print(json.dumps({"cpus": cpus, "sf_dir": sf_dir,
                      "max_partition_bytes": mpb,
                      "total": round(sum(times.values()), 3),
                      "queries": times}))
    spark.stop()


if __name__ == "__main__":
    main()
