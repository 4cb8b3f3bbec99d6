#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clickhouse_from_scratch_spark.queries import QUERIES  # noqa: E402
from clickhouse_from_scratch_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "join_asof",
    "limit_by_priority",
    "window_running_sum",
    "with_totals",
    "time_bucket_hourly",
    "sessionization",
    "dedup_minhash_lsh",
    "embedding_cosine_topk",
    "text_quality",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.0
    spark = get_spark("bench")

    # warm the JVM + parquet footer caches + whole-stage codegen +
    # Python workers once PER QUERY so the timed passes measure
    # steady-state execution, not session/interpreter/compile startup
    # (the pandas_udf queries pay a per-worker numpy+pandas import,
    # ~6-8s across 32 workers, on first use only; each query class pays
    # its codegen compile on first run)
    for name in HEADLINE:
        QUERIES[name](spark, sf_dir).count()

    # min-of-3 timed passes per query: a co-loaded box inflates single
    # shots 1.5-2x (the r10 bench artifacts were load-contaminated);
    # the minimum is the best estimate of the plan's intrinsic cost
    PASSES = 3
    times: dict[str, float] = {}
    for name in HEADLINE:
        best, rows = float("inf"), 0
        for _ in range(PASSES):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            rows = df.count()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)
        print(f"# {name}: {times[name]}s ({rows} rows, min of {PASSES})",
              file=sys.stderr)

    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
