"""Data selection via importance resampling (DSIR) for LLM pipelines.

Selects raw-corpus documents that look like a TARGET corpus by scoring
each document with hashed n-gram importance weights (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"):

1. featurize: hash every token (and optionally bigram) into a small
   fixed bucket space;
2. estimate per-bucket probabilities of the target corpus and the raw
   corpus (add-one smoothing);
3. score each document by the sum over its tokens of the bucket's
   log-probability ratio log p_target(b) - log p_raw(b);
4. keep the top-k (or sample proportionally to the weight).

Scale shape: featurization is one explode + one (doc, bucket) groupBy
(a single hash shuffle over token counts); the bucket tables are at
most ``16^bucket_hex`` rows (4096 at the default) and BROADCAST into
the scoring join; the final score is one groupBy doc_id. No all-pairs,
no driver state — a 100 TB corpus scores in one pass over the tokens.

Two scoring modes:

- ``log`` (the published DSIR weight): float log-ratio sum. The scale
  path — magnitudes stay O(tokens-per-doc), no overflow at any corpus
  size. Not exactly oracle-able (libm ``ln`` may differ across
  engines in the last ulp).
- ``linear``: integer score sum(c_b * ((t_b+1)*R - (r_b+1)*T)) with
  T = target_tokens + B, R = raw_tokens + B. Dividing by T*R this is
  sum(c_b * (p_target(b) - p_raw(b))) — a probability-DIFFERENCE
  importance signal rather than the log-ratio: deterministic and
  exact in integers, so DuckDB recomputes it bit-for-bit (the oracle
  twin, same device as dedup's md5-domain twin). It is NOT rank-
  equivalent to the log weight (difference scoring emphasizes
  frequent buckets, log-ratio emphasizes rare discriminative ones);
  it exists to pin the shared featurize/estimate/score plumbing
  under an exact oracle. Products are bounded by tokens^2, so keep
  this mode for validation corpora (int64 overflows near 3e9 total
  tokens); production selection uses ``log``.

``normalize=True`` divides the score by the document's feature count
(per-token average). Raw DSIR sums are likelihood ratios and scale
with document length, so mixed-length top-k skews short; the
normalized score compares documents of different lengths fairly.
IEEE double division is deterministic, so the normalized linear
score still matches the DuckDB oracle exactly.

The bucket id is the md5 hex prefix of the feature string — the same
cross-engine-deterministic device as split.py/mix.py, and it keeps the
bucket key a plain string (GROUP BY works identically everywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokens_col(text_col: str = "text"):
    """Lower-cased whitespace tokens, DuckDB-identical
    (list_filter(string_split_regex(lower(text), '\\s+'), ...))."""
    return F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda x: x != "")


def featurize(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", bucket_hex: int = 3,
              bigrams: bool = False) -> DataFrame:
    """(id_col, bucket, cnt): hashed token counts per document.

    ``bucket_hex`` hex digits of md5 → 16^bucket_hex buckets (3 → 4096).
    ``bigrams`` adds space-joined adjacent-token pairs to the feature
    stream (hashed into the same bucket space, as in the paper).
    One explode + one groupBy — a single shuffle keyed (doc, bucket).
    """
    feats = tokens_col(text_col)
    if bigrams:
        # let-bind the token array (1-element transform) so the regex
        # split runs once per row — inlined it would run 5x (two slices,
        # two sizes, the concat; lambda copies defeat Catalyst CSE)
        def with_pairs(toks):
            m = F.greatest(F.size(toks) - 1, F.lit(0))
            pairs = F.zip_with(
                F.slice(toks, 1, m), F.slice(toks, 2, m),
                lambda a, b: F.concat(a, F.lit(" "), b))
            return F.concat(toks, pairs)

        feats = F.element_at(
            F.transform(F.array(tokens_col(text_col)), with_pairs), 1)
    return (df.select(F.col(id_col),
                      F.explode(feats).alias("__feat"))
              .select(id_col,
                      F.substring(F.md5("__feat"), 1,
                                  bucket_hex).alias("bucket"))
              .groupBy(id_col, "bucket")
              .agg(F.count(F.lit(1)).alias("cnt")))


def bucket_counts(feat_df: DataFrame) -> DataFrame:
    """(bucket, n): corpus-level token count per bucket."""
    return feat_df.groupBy("bucket").agg(F.sum("cnt").alias("n"))


def dsir_score(raw: DataFrame, target: DataFrame,
               id_col: str = "doc_id", text_col: str = "text",
               bucket_hex: int = 3, bigrams: bool = False,
               mode: str = "log", normalize: bool = False) -> DataFrame:
    """Per-document importance score of ``raw`` docs against the
    ``target`` corpus → (id_col, score).

    mode='log'    — published DSIR log-ratio weight (Float64).
    mode='linear' — integer-exact probability-difference signal
                    (Int64; Float64 when normalized), see module
                    docstring for semantics and the overflow bound.
    normalize     — divide by the doc's feature count (length-fair
                    ranking; IEEE division keeps oracle exactness).
    """
    n_buckets = 16 ** bucket_hex
    raw_feats = featurize(raw, id_col, text_col, bucket_hex, bigrams)
    tgt_feats = featurize(target, id_col, text_col, bucket_hex, bigrams)
    r = bucket_counts(raw_feats).withColumnRenamed("n", "r_n")
    t = bucket_counts(tgt_feats).withColumnRenamed("n", "t_n")
    # full outer on the two tiny bucket tables (≤ 16^bucket_hex rows),
    # missing buckets smooth to count 0 (+1 below)
    buckets = (r.join(t, "bucket", "full_outer")
                .select("bucket",
                        F.coalesce("r_n", F.lit(0)).alias("r_n"),
                        F.coalesce("t_n", F.lit(0)).alias("t_n")))
    if mode == "log":
        # totals as scalar subquery-free literals would need an action;
        # instead normalize inside the weight via a cross-joined 1-row
        # totals frame (broadcast, no collect)
        totals = buckets.agg(
            (F.sum("r_n") + n_buckets).alias("R"),
            (F.sum("t_n") + n_buckets).alias("T"))
        w = (buckets.crossJoin(F.broadcast(totals))
             .select("bucket",
                     (F.log((F.col("t_n") + 1) / F.col("T"))
                      - F.log((F.col("r_n") + 1) / F.col("R")))
                     .alias("w")))
        scored = (raw_feats.join(F.broadcast(w), "bucket")
                  .groupBy(id_col)
                  .agg(F.sum(F.col("cnt") * F.col("w")).alias("score"),
                       F.sum("cnt").alias("__n")))
        if normalize:
            scored = scored.select(
                id_col, (F.col("score") / F.col("__n")).alias("score"))
        else:
            scored = scored.drop("__n")
        return scored
    if mode != "linear":
        raise ValueError(f"dsir_score mode must be log|linear: {mode}")
    totals = buckets.agg(
        (F.sum("r_n") + n_buckets).cast("long").alias("R"),
        (F.sum("t_n") + n_buckets).cast("long").alias("T"))
    w = (buckets.crossJoin(F.broadcast(totals))
         .select("bucket",
                 ((F.col("t_n") + 1) * F.col("R")
                  - (F.col("r_n") + 1) * F.col("T")).cast("long")
                 .alias("w")))
    scored = (raw_feats.join(F.broadcast(w), "bucket")
              .groupBy(id_col)
              .agg(F.sum(F.col("cnt") * F.col("w")).cast("long")
                   .alias("score"),
                   F.sum("cnt").cast("long").alias("__n")))
    if normalize:
        return scored.select(
            id_col, (F.col("score").cast("double")
                     / F.col("__n").cast("double")).alias("score"))
    return scored.drop("__n")


def dsir_select(raw: DataFrame, target: DataFrame, k: int,
                id_col: str = "doc_id", text_col: str = "text",
                bucket_hex: int = 3, bigrams: bool = False,
                mode: str = "log", normalize: bool = True) -> DataFrame:
    """Top-k raw documents by importance score (ties break on id for
    determinism; normalized by default so mixed-length corpora rank
    fairly). orderBy+limit is a TakeOrderedAndProject — per-partition
    top-k then a k-row merge, never a global sort."""
    scored = dsir_score(raw, target, id_col, text_col, bucket_hex,
                        bigrams, mode, normalize)
    return (scored.orderBy(F.col("score").desc(), F.col(id_col))
                  .limit(k))
