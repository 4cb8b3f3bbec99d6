#!/usr/bin/env python
"""Per-headline-query profile: plan BUILD time (driver-side Python +
analysis — inside the bench's timed region), the bench action count(),
and the noop sink (guide §1.4 — computes every column, which count()
does not). Min-of-N each, jobs labeled (guide §1.5).

Usage: python tools/profile_bench.py [--passes 3] [--queries a,b,...]
Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_from_scratch_spark.queries import QUERIES  # noqa: E402
from clickhouse_from_scratch_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "join_asof", "limit_by_priority", "window_running_sum", "with_totals",
    "time_bucket_hourly", "sessionization", "dedup_minhash_lsh",
    "embedding_cosine_topk", "text_quality",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--queries", default=None)
    args = ap.parse_args()
    names = args.queries.split(",") if args.queries else HEADLINE

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_bench")

    for name in names:                      # warm (JIT, footers, workers)
        QUERIES[name](spark, sf_dir).count()

    tot = {"build": 0.0, "count": 0.0, "noop": 0.0}
    print(f"{'query':<24} {'build':>8} {'count':>8} {'noop':>8}")
    for name in names:
        best = {"build": float("inf"), "count": float("inf"),
                "noop": float("inf")}
        for _ in range(args.passes):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            best["build"] = min(best["build"], time.perf_counter() - t0)

            spark.sparkContext.setJobDescription(f"profile:{name}:count")
            t0 = time.perf_counter()
            df.count()
            best["count"] = min(best["count"], time.perf_counter() - t0)

            spark.sparkContext.setJobDescription(f"profile:{name}:noop")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best["noop"] = min(best["noop"], time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        for k in tot:
            tot[k] += best[k]
        print(f"{name:<24} {best['build']:>8.3f} {best['count']:>8.3f} "
              f"{best['noop']:>8.3f}")
    print(f"{'TOTAL':<24} {tot['build']:>8.3f} {tot['count']:>8.3f} "
          f"{tot['noop']:>8.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
