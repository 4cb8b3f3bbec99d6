#!/usr/bin/env python
"""Stage-by-stage timing of the dedup_minhash_lsh pipeline (guide §1):
signatures -> banded -> buckets -> pairs, each noop-sunk min-of-3,
plus the Arrow-kernel twin for comparison.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from clickhouse_from_scratch_spark.catalog import load_table  # noqa: E402
from clickhouse_from_scratch_spark.pipeline import dedup  # noqa: E402
from clickhouse_from_scratch_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(label, df, passes=3):
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:32s} {best:7.3f}s")
    return best


def main():
    spark = get_spark("minhash_breakdown")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")

    # warm
    dedup.minhash_lsh_candidates(docs, use_arrow=False).count()
    dedup.minhash_lsh_candidates(docs, use_arrow=True).count()

    base = dedup._ensure_parallelism(docs)
    timed("scan+repartition", base)
    sh = base.withColumn("__shingles",
                         dedup.shingles(F.col("text"), 3)).drop("text")
    timed("+shingles", sh)
    sigs_jvm = dedup.minhash_signatures(docs, use_arrow=False)
    timed("+minhash sig (jvm)", sigs_jvm.drop("text"))
    sigs_arrow = dedup.minhash_signatures(docs, use_arrow=True)
    timed("+minhash sig (arrow)", sigs_arrow.drop("text"))

    r, bands = 4, 16
    args = ", ".join(f"signature[b*{r}+{i}]" for i in range(r))
    band_sql = (f"transform(sequence(0, {bands - 1}), "
                f"b -> named_struct('band', b, "
                f"'bucket', xxhash64(b, {args})))")
    banded = (sigs_jvm.select(
        F.col("doc_id"), F.explode(F.expr(band_sql)).alias("bk"))
        .select("doc_id", F.col("bk.band").alias("band"),
                F.col("bk.bucket").alias("bucket")))
    timed("+banded", banded)
    buckets = (banded.groupBy("band", "bucket")
               .agg(F.array_sort(F.collect_set("doc_id")).alias("ids"))
               .filter((F.size("ids") > 1) & (F.size("ids") <= 10000)))
    timed("+buckets", buckets)
    pairs = dedup.pairs_from_buckets(buckets)
    timed("+pairs(distinct)", pairs)
    timed("full query (jvm, ordered)",
          dedup.minhash_lsh_candidates(docs, use_arrow=False)
          .orderBy("id_a", "id_b"))
    timed("full query (arrow, ordered)",
          dedup.minhash_lsh_candidates(docs, use_arrow=True)
          .orderBy("id_a", "id_b"))
    spark.stop()


if __name__ == "__main__":
    main()
