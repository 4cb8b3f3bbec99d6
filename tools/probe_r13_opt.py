#!/usr/bin/env python
"""Probe equivalence of the planned r13 optimization rewrites (small data,
local[2]): (a) minhash via one SQL expr string == current zip_with build;
(b) long-arg xxhash64 banding produces the same candidate pairs;
(c) factored-norm cosine is bitwise-identical to inline cosine."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from clickhouse_from_scratch_spark.pipeline.dedup import (
    _MERSENNE, _MIX, _perm_params, minhash_signatures, shingles)

spark = (SparkSession.builder.master("local[2]").appName("probe_r13")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.ansi.enabled", "false")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

rows = [(i, f"the quick brown fox {i} jumps over the lazy dog "
            f"lorem ipsum dolor sit amet number {i % 7}") for i in range(50)]
rows += [(100, ""), (101, "one two")]
docs = spark.createDataFrame(rows, "doc_id long, text string")

# --- (a) minhash via single F.expr string --------------------------------
K = 64
params = _perm_params(K)
ab_sql = "array(" + ",".join(
    f"named_struct('a', {a}L, 'b', {b}L)" for a, b in params) + ")"
sig_sql = (f"aggregate(__sh, array_repeat({_MERSENNE}L, {K}), "
           f"(acc, h) -> zip_with(acc, {ab_sql}, "
           f"(cur, p) -> least(cur, pmod(h * p.a + p.b, {_MERSENNE}L))), "
           f"x -> x)")

t0 = time.perf_counter()
old = minhash_signatures(docs, use_arrow=False).select("doc_id", "signature")
t_old = time.perf_counter() - t0

t0 = time.perf_counter()
wh = F.transform(F.filter(F.split(F.lower(F.col("text")), r"\s+"),
                          lambda w: w != ""), lambda w: F.xxhash64(w))
m = F.greatest(F.size(F.col("__wh")) - 2, F.lit(0))
acc = F.slice(F.col("__wh"), 1, m)
for i in range(1, 3):
    acc = F.zip_with(acc, F.slice(F.col("__wh"), i + 1, m),
                     lambda x, y: x * F.lit(_MIX) + y)
new = (docs.withColumn("__wh", wh)
           .withColumn("__sh", F.array_distinct(acc))
           .select("doc_id", F.expr(sig_sql).alias("signature")))
t_new = time.perf_counter() - t0
print(f"build old={t_old:.3f}s new={t_new:.3f}s")

a = {r.doc_id: r.signature for r in old.collect()}
b = {r.doc_id: r.signature for r in new.collect()}
assert a == b, "signature mismatch"
print("minhash signatures IDENTICAL:", len(a))

# --- (b) banding: long-arg xxhash64 vs string concat ---------------------
bands, r = 16, 4
band_sql = (f"transform(sequence(0, {bands - 1}), b -> named_struct("
            "'band', b, 'bucket', xxhash64(b, "
            + ", ".join(f"signature[b*{r}+{i}]" for i in range(r)) + ")))")
sigs = new.withColumnRenamed("signature", "signature")
banded_new = (sigs.select("doc_id",
                          F.explode(F.expr(band_sql)).alias("bk"))
              .select("doc_id", "bk.band", "bk.bucket"))
banded_new.collect()
print("long-arg banding executes ok;",
      banded_new.select("bucket").distinct().count(), "buckets")

# group equality: docs sharing old-style band slice must share new bucket
slice_key = (sigs.select("doc_id", F.explode(F.expr(
    f"transform(sequence(0, {bands-1}), b -> named_struct('band', b, "
    f"'key', array_join(transform(slice(signature, b*{r}+1, {r}), "
    "x -> cast(x as string)), ',')))")).alias("bk"))
    .select("doc_id", "bk.band", "bk.key"))
j = (slice_key.join(banded_new, ["doc_id", "band"])
     .groupBy("band", "key").agg(F.countDistinct("bucket").alias("nb")))
assert j.filter("nb > 1").count() == 0
print("bucket equality preserved per band-slice")

# --- (c) factored-norm cosine bitwise check ------------------------------
import numpy as np
rng = np.random.RandomState(7)
emb = spark.createDataFrame(
    [(i, [float(x) for x in rng.randn(16).astype("float32")])
     for i in range(40)], "vec_id long, embedding array<float>")
from clickhouse_from_scratch_spark.pipeline.similarity import (
    _dot, _norm, cosine)
q = (emb.filter("vec_id < 5")
     .select(F.col("vec_id").alias("query_id"),
             F.col("embedding").alias("__qvec")))
inline = (emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
          .select("query_id", "vec_id",
                  cosine(F.col("embedding"), F.col("__qvec")).alias("s")))
q2 = (emb.filter("vec_id < 5")
      .select(F.col("vec_id").alias("query_id"),
              F.col("embedding").alias("__qvec"),
              _norm(F.col("embedding")).alias("__qn")))
fact = (emb.withColumn("__cn", _norm(F.col("embedding")))
        .join(F.broadcast(q2), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id",
                (_dot(F.col("embedding"), F.col("__qvec"))
                 / (F.col("__cn") * F.col("__qn"))).alias("s")))
ai = {(r.query_id, r.vec_id): r.s for r in inline.collect()}
bi = {(r.query_id, r.vec_id): r.s for r in fact.collect()}
assert all(ai[k] == bi[k] for k in ai), "cosine not bitwise identical"
print("factored cosine bitwise identical:", len(ai), "pairs")

spark.stop()
print("ALL PROBES PASS")
