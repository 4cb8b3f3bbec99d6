#!/usr/bin/env python
"""VERDICT r13 item 2: does the Arrow/numpy MinHash kernel beat the
pure-JVM expression kernel at sf1 (10x the bench data), where the
per-worker numpy import amortizes?

Measures, min-of-N warm passes at the given sf_dir:
  - signature-only pass (noop sink: computes every signature)
  - full LSH candidate count (the declared dedup_minhash_lsh shape)
for use_arrow=False (JVM) and use_arrow=True (Arrow pandas_udf).

Usage: python tools/probe_r14_arrow.py [sf_dir] [passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_from_scratch_spark.catalog import load_table  # noqa: E402
from clickhouse_from_scratch_spark.pipeline.dedup import (  # noqa: E402
    minhash_lsh_candidates, minhash_signatures)
from clickhouse_from_scratch_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".data/sf1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("probe_r14_arrow")
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    print(f"{sf_dir}: {n} documents")

    results = {}
    for arrow in (False, True):
        label = "arrow" if arrow else "jvm"
        # warm: JIT + (for arrow) per-worker numpy/pandas import
        minhash_signatures(docs, use_arrow=arrow) \
            .write.format("noop").mode("overwrite").save()
        minhash_lsh_candidates(docs, use_arrow=arrow).count()

        sig_best, cand_best = float("inf"), float("inf")
        sig_all, cand_all = [], []
        for _ in range(passes):
            spark.sparkContext.setJobDescription(f"minhash sig ({label})")
            t0 = time.perf_counter()
            minhash_signatures(docs, use_arrow=arrow) \
                .write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            sig_all.append(round(dt, 2))
            sig_best = min(sig_best, dt)

            spark.sparkContext.setJobDescription(f"minhash cands ({label})")
            t0 = time.perf_counter()
            pairs = minhash_lsh_candidates(docs, use_arrow=arrow).count()
            dt = time.perf_counter() - t0
            cand_all.append(round(dt, 2))
            cand_best = min(cand_best, dt)
            spark.sparkContext.setJobDescription(None)
        results[label] = (sig_best, cand_best, pairs)
        print(f"{label}: signature noop {sig_best:.2f}s {sig_all}, "
              f"candidates count {cand_best:.2f}s {cand_all}, "
              f"{pairs} pairs")

    assert results["jvm"][2] == results["arrow"][2], "pair counts differ!"
    spark.stop()


if __name__ == "__main__":
    main()
