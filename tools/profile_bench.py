#!/usr/bin/env python
"""Optimization-round measurement harness (guide §1).

For each headline query: time plan BUILD (driver-side Python+analysis),
the bench action (count), and the noop sink (full-column compute, §1.4),
each min-of-N on a warmed session; dump .explain('formatted') to
plans/<tag>/<name>_<suffix>.txt.

Usage: python tools/profile_bench.py [--tag r13] [--suffix before]
                                     [--passes 3] [name ...]
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
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--no-noop", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    names = args.names or HEADLINE

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", args.tag)
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark("profile_bench")
    for name in names:          # warm: codegen + python workers + footers
        QUERIES[name](spark, sf_dir).count()

    print(f"{'query':28s} {'build':>7s} {'count':>7s} {'noop':>7s}")
    totals = [0.0, 0.0, 0.0]
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        b = c = nn = float("inf")
        for _ in range(args.passes):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            b, c = min(b, t1 - t0), min(c, t2 - t1)
            if not args.no_noop:
                df2 = QUERIES[name](spark, sf_dir)
                t3 = time.perf_counter()
                df2.write.format("noop").mode("overwrite").save()
                nn = min(nn, time.perf_counter() - t3)
        with open(os.path.join(plans_dir, f"{name}_{args.suffix}.txt"), "w") as f:
            f.write(QUERIES[name](spark, sf_dir)._sc._jvm.PythonSQLUtils
                    .explainString(QUERIES[name](spark, sf_dir)
                                   ._jdf.queryExecution(), "formatted"))
        nn_s = "-" if args.no_noop else f"{nn:7.3f}"
        print(f"{name:28s} {b:7.3f} {c:7.3f} {nn_s}")
        totals[0] += b
        totals[1] += c
        totals[2] += 0 if args.no_noop else nn
    print(f"{'TOTAL':28s} {totals[0]:7.3f} {totals[1]:7.3f} {totals[2]:7.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
