#!/usr/bin/env python
"""Dump .explain("formatted") for catalog queries into plans/<dir>/.

Usage: python tools/dump_plans.py <out_subdir> <suffix> <query> [query ...]
e.g.   python tools/dump_plans.py r14 before dedup_minhash_lsh
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_from_scratch_spark.queries import QUERIES  # noqa: E402
from clickhouse_from_scratch_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = os.path.join(here, "plans", out_dir)
    os.makedirs(plans_dir, exist_ok=True)
    spark = get_spark("dump_plans")
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(jmode)
        path = os.path.join(plans_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
