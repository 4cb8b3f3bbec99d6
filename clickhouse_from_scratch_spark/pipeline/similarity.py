"""Embedding similarity search over an ``array<float>`` column.

- ``brute_force_topk``: exact cosine top-k. The query set is broadcast
  (small side); the corpus streams through one pass — at 100 TB this is
  a single scan + a per-query-key top-k window, no corpus self-shuffle.
- ``lsh_bucketed_topk``: random-hyperplane LSH (sign of projection onto
  fixed seeded hyperplanes) buckets the corpus; each query probes only
  its bucket. Trades recall for a candidate set ~corpus/2^bits.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0),
                              lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns (JVM-side HOFs)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id_col: str = "query_id",
                     round_digits: int | None = None) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` must have (query_id_col, vec_col). Self-matches (same id)
    are excluded when query ids live in the corpus id space.
    ``round_digits`` rounds the similarity *before* ranking so the top-k
    cut is stable under float noise (oracle comparability).
    """
    q = queries.select(F.col(query_id_col),
                       F.col(vec_col).alias("__qvec"))
    sim = cosine(F.col(vec_col), F.col("__qvec"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (corpus.join(F.broadcast(q),
                          F.col(id_col) != F.col(query_id_col), "inner")
              .select(query_id_col, id_col, sim.alias("cos_sim")))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc())
    return (scored.withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") <= k).drop("__rn"))


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(bits, dim).astype(float).tolist()


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: one bit per plane (sign of dot)."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(v) for v in plane])
        bit = F.when(_dot(vec, lit_plane) > 0, F.lit(1).cast("long")) \
               .otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseOR(F.shiftleft(bit, i))
    return sig


def lsh_bucketed_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      query_id_col: str = "query_id", bits: int = 8,
                      dim: int = 64) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket.

    At scale the corpus is hashed once (could be written bucketed-by
    ``bucket`` for reuse); each query joins its bucket — shuffle is
    corpus-size once, then bucket-local.
    """
    planes = _hyperplanes(dim, bits)
    c = corpus.withColumn("__bucket", lsh_bucket(F.col(vec_col), planes))
    q = (queries.select(query_id_col, F.col(vec_col).alias("__qvec"))
                .withColumn("__bucket", lsh_bucket(F.col("__qvec"), planes)))
    scored = (c.join(F.broadcast(q), "__bucket")
               .filter(F.col(id_col) != F.col(query_id_col))
               .select(query_id_col, id_col,
                       cosine(F.col(vec_col), F.col("__qvec")).alias("cos_sim")))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc())
    return (scored.withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") <= k).drop("__rn"))
