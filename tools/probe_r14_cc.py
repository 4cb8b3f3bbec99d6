#!/usr/bin/env python
"""VERDICT r13 item 3: connected-components loop cost on a deep chain.

Fixture: one path graph of N nodes (worst-case diameter — every round
matters) plus the sf0.01 dedup_cc_keep query. Compares the shipped
``connected_components`` against the pre-r14 spelling (edges NOT
pre-partitioned by src → the hop join re-shuffles all 2|E| edge rows
every round). Labels must be identical.

Usage: python tools/probe_r14_cc.py [chain_len]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from clickhouse_from_scratch_spark.session import get_spark  # noqa: E402


def old_cc(pairs: DataFrame, max_iter: int = 25,
           _stats: dict | None = None) -> DataFrame:
    """Pre-r14 loop: identical except edges are not pre-partitioned."""
    edges = (pairs.select(F.col("id_a").alias("src"),
                          F.col("id_b").alias("dst"))
             .union(pairs.select(F.col("id_b").alias("src"),
                                 F.col("id_a").alias("dst")))
             .distinct()
             .localCheckpoint(eager=True))
    labels = (edges.select(F.col("src").alias("id")).distinct()
              .withColumn("comp", F.col("id"))
              .localCheckpoint(eager=True))
    for r in range(max_iter):
        nbr = (edges.join(labels.withColumnRenamed("id", "src"), "src")
               .groupBy("dst").agg(F.min("comp").alias("nbr_comp"))
               .withColumnRenamed("dst", "id"))
        hop = (labels.join(nbr, "id", "left")
               .select("id", F.col("comp").alias("__old"),
                       F.least("comp", "nbr_comp").alias("comp")))
        parents = hop.select(F.col("id").alias("__pid"),
                             F.col("comp").alias("__pcomp"))
        new_labels = (hop.join(parents, hop["comp"] == parents["__pid"],
                               "left")
                      .select("id", "__old",
                              F.least(F.col("comp"),
                                      F.coalesce("__pcomp", "comp"))
                              .alias("comp"))
                      .localCheckpoint(eager=True))
        changed = (new_labels.filter(F.col("__old") != F.col("comp"))
                   .limit(1).count())
        labels = new_labels.drop("__old")
        if changed == 0:
            if _stats is not None:
                _stats["rounds"] = r + 1
            return labels
    raise RuntimeError("no convergence")


def main() -> None:
    chain_len = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 17
    spark = get_spark("probe_r14_cc")
    from clickhouse_from_scratch_spark.pipeline.dedup import (
        connected_components)

    chain = (spark.range(chain_len - 1)
             .select(F.col("id").alias("id_a"),
                     (F.col("id") + 1).alias("id_b"))
             .localCheckpoint(eager=True))

    for label, fn in [("old", old_cc), ("new", connected_components)]:
        stats: dict = {}
        t0 = time.perf_counter()
        out = fn(chain, max_iter=25, _stats=stats).orderBy("id")
        n = out.count()
        wall = time.perf_counter() - t0
        mn = out.agg(F.min("comp"), F.max("comp")).collect()[0]
        print(f"{label}: chain {chain_len}: {n} labels in {wall:.2f}s, "
              f"{stats.get('rounds')} rounds, comp range "
              f"[{mn[0]}, {mn[1]}]")
        assert mn[0] == 0 and mn[1] == 0, "chain must collapse to comp 0"

    # A/B on the declared query's edge shape at sf0.01
    from clickhouse_from_scratch_spark.catalog import load_table
    from pyspark.sql import Window
    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    w = Window.partitionBy("lang", "source").orderBy("doc_id")
    pairs = (docs.select("doc_id", "lang", "source")
             .withColumn("__nxt", F.lead("doc_id").over(w))
             .filter(F.col("__nxt").isNotNull())
             .select(F.col("doc_id").alias("id_a"),
                     F.col("__nxt").alias("id_b")))
    for label, fn in [("old", old_cc), ("new", connected_components)]:
        stats = {}
        t0 = time.perf_counter()
        rows = sorted(map(tuple, fn(pairs, _stats=stats).collect()))
        wall = time.perf_counter() - t0
        print(f"{label}: sf0.01 cc: {len(rows)} labels in {wall:.2f}s, "
              f"{stats.get('rounds')} rounds")
        if label == "old":
            ref = rows
        else:
            assert rows == ref, "labels differ!"
    print("labels identical")
    spark.stop()


if __name__ == "__main__":
    main()
