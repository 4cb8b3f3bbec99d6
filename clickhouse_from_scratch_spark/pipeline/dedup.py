"""Document deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale notes (the whole point of these designs):
- Exact dedup: hash-groupBy on a 64-bit content hash — one shuffle whose
  keys are uniform by construction (no skew), map-side combine applies.
- MinHash+LSH: per-row signature computation is embarrassingly parallel
  and stays JVM-side (xxhash64 + transform/array_min — no Python).
  Candidate generation explodes b band-keys per doc and self-joins on the
  band key: shuffle volume is b×docs instead of docs², and bucket sizes
  are bounded by the hash space. This is the only all-pairs-avoiding
  strategy that survives 100 TB.
- SimHash: 64-bit signature via per-bit weighted majority over token
  hashes; near-dup = identical signature (or banded prefix join for
  hamming<k candidates).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Fixed odd multipliers/addends (splitmix64-style constants) make the K
# minhash permutations deterministic across runs and engines.
_MERSENNE = (1 << 61) - 1


def _perm_params(k: int) -> list[tuple[int, int]]:
    """K deterministic (a, b) pairs for h' = (a*h + b) mod M, seeded 42."""
    import random
    rnd = random.Random(42)
    return [(rnd.randrange(1, _MERSENNE - 1) | 1, rnd.randrange(0, _MERSENNE - 1))
            for _ in range(k)]


# odd 64-bit mix constant for rolling shingle-hash combination
_MIX = -7046029254386353131


def _q(name: str) -> str:
    """Backtick-quote an identifier for interpolation into the SQL-string
    plan builders, escaping embedded backticks (r13 ADVICE: a column
    name containing ` must not break the expression)."""
    return "`" + name.replace("`", "``") + "`"


# (applicationId, analyzed-plan semanticHash) -> scan partition count.
# The probe triggers physical planning (~50 ms); semantically identical
# plans over unchanged files split identically, so repeated builds of
# the same query (the bench's min-of-3) skip the re-planning — the same
# equivalence Spark's own ReuseExchange relies on. Keyed by appId so a
# restarted session never sees a stale count.
_NPARTS_MEMO: dict[tuple[str, int], int] = {}


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Spread CPU-heavy per-row kernels across the cluster when the scan
    yields fewer partitions than cores (a handful of small parquet files
    would otherwise pin the whole signature pass to a few tasks). The
    repartition shuffle is linear in the input and only paid when the
    partition count is actually deficient — at real scale the scan
    already has more splits than cores and this is a no-op."""
    if df.isStreaming:
        # .rdd is a batch-only API (throws on streaming frames); micro-
        # batch sizing is the scheduler's job there anyway
        return df
    par = df.sparkSession.sparkContext.defaultParallelism
    # half the cores: measured sweet spot — tasks ≈ cores schedules
    # erratically on a busy executor (1.6-9s spread at 32/32 vs a steady
    # 1.3s at 16/32 for the sf0.1 minhash pass); real clusters keep the
    # same headroom for concurrent stages
    target = max(2, par // 2)
    try:
        # physical-plan partition count WITHOUT df.rdd: the .rdd property
        # additionally builds the Python-serialized RDD wrapper
        # (javaToPython), ~50 ms per call vs ~3 ms for toRdd() (guide
        # §1.2 driver-side per-task work; plan build is inside the
        # bench's timed region)
        qe = df._jdf.queryExecution()
        key = (df.sparkSession.sparkContext.applicationId,
               qe.analyzed().semanticHash())
        n_parts = _NPARTS_MEMO.get(key)
        if n_parts is None:
            n_parts = qe.toRdd().getNumPartitions()
            _NPARTS_MEMO[key] = n_parts
    except AttributeError:          # non-classic backend: keep public API
        n_parts = df.rdd.getNumPartitions()
    if n_parts < target:
        return df.repartition(target)
    return df


def _shingles_sql(col_sql: str, n: int = 3) -> str:
    """SQL-string form of :func:`shingles` over a column expression.

    One ``F.expr`` parses JVM-side in a single py4j call; composing the
    same tree from Python HOFs (``F.filter``/``F.transform``/
    ``F.zip_with``) costs ~40 py4j round trips and measured ~270 ms of
    driver time PER BUILD vs ~1 ms for the string (guide §1.2 — plan
    build is inside the bench's timed region). Tree and results are
    identical (probe: 0 differing rows at sf0.1, both directions).
    """
    m = f"greatest(size(wh) - {n - 1}, 0)"
    acc = f"slice(wh, 1, {m})"
    for i in range(1, n):
        acc = (f"zip_with({acc}, slice(wh, {i + 1}, {m}), "
               f"(x, y) -> x * {_MIX}L + y)")
    return (
        "element_at(transform(array(transform(filter(split(lower("
        f"{col_sql}), '\\\\s+'), w -> w <> ''), w -> xxhash64(w))), "
        f"wh -> array_distinct({acc})), 1)")


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingle hashes (distinct) — array<long>, JVM-side.

    Hash each word once, then combine n consecutive word hashes with
    integer arithmetic (h·MIX + next). Building shingle *strings* per
    window (slice + array_join per index) costs O(words·n) string
    allocations and measured ~4× slower; this is pure long math over
    aligned slices. Empty/short docs yield an empty array.

    The word-hash array is let-bound (1-element ``transform``) so it is
    evaluated ONCE per row: inlining the same expression n·2 times
    re-resolves it with fresh lambda ids, which defeats Catalyst's
    subexpression elimination — the r12 plan tokenized+hashed every
    document 6× (guide §1.2 per-task work).

    Pass the column NAME (str) to build the whole expression as one
    ``F.expr`` (see :func:`_shingles_sql`); a ``Column`` argument keeps
    the Python-HOF composition for arbitrary expressions.
    """
    if isinstance(text, str):
        quoted = _q(text) if not text.startswith("`") else text
        return F.expr(_shingles_sql(quoted, n))
    words = F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")
    wh_expr = F.transform(words, lambda w: F.xxhash64(w))

    def from_wh(wh: Column) -> Column:
        m = F.greatest(F.size(wh) - (n - 1), F.lit(0))
        acc = F.slice(wh, 1, m)
        for i in range(1, n):
            acc = F.zip_with(acc, F.slice(wh, i + 1, m),
                             lambda x, y: x * F.lit(_MIX) + y)
        return F.array_distinct(acc)

    # let-binding: transform([wh_expr], wh -> body)[0] evaluates wh_expr
    # once and the body references the bound lambda variable (O(1) reads)
    return F.element_at(F.transform(F.array(wh_expr), from_wh), 1)


def _bounded_buckets(banded: DataFrame, keys: Sequence[str], id_col: str,
                     max_bucket_size: int) -> DataFrame:
    """(keys..., ids) bucket rows with 2 <= size(ids) <= max_bucket_size,
    built with BOUNDED per-task memory.

    collect_set-then-filter materializes the FULL id array of every
    bucket before the size filter can drop it: a hot bucket (millions of
    boilerplate-identical documents share every band hash in real LLM
    corpora) accumulates an arbitrarily large array in one aggregation
    buffer — executor OOM at 100 TB (guide §2.5/§5). Instead, rank ids
    inside each bucket with a streaming ``row_number`` window (running
    frame: O(1) state; the backing sort spills to disk) and drop rows
    past ``max_bucket_size + 1`` BEFORE any array is built. Catalyst
    turns the rank filter into a WindowGroupLimit with a PARTIAL pass
    before the exchange, so a hot bucket also never ships more than
    cap+1 rows per map task — the shuffle is bounded too.

    Output is exactly the old collect_set-then-filter result: under-cap
    buckets keep every id; over-cap buckets keep cap+1 ids — enough for
    the ``size <= cap`` filter to drop them, as before. The final
    groupBy reuses the window's (keys) partitioning: still ONE exchange
    (guide §2.4). Precondition (holds for every banding caller): banded
    has at most one row per (keys, id) and ``id_col`` is non-null.
    """
    # ONE selectExpr + where: the Window-spec/withColumn composition
    # costs ~6 extra py4j round trips and an extra analyzer pass per
    # plan build (guide §1.2); the SQL window is the same expression
    key_sql = ", ".join(_q(k) for k in keys)
    capped = (banded
              .selectExpr("*",
                          f"row_number() OVER (PARTITION BY {key_sql} "
                          f"ORDER BY {_q(id_col)}) AS __rn")
              .where(f"__rn <= {max_bucket_size + 1}"))
    return (capped.groupBy(*keys)
            .agg(F.array_sort(F.collect_set(id_col)).alias("ids"))
            .filter((F.size("ids") > 1)
                    & (F.size("ids") <= max_bucket_size)))


def _banded_pairs_one_sql(docs: DataFrame, banded_select: list[str],
                          id_col: str, keys: Sequence[str],
                          max_bucket_size: int) -> DataFrame:
    """The full banding → bounded-buckets → pair-explode kernel as ONE
    ``spark.sql`` over the prepared input frame.

    The DataFrame spelling paid ~10 eagerly-analyzed placements, each
    re-running the analyzer's fixed point over the growing tree — and
    the banding expression is a multi-KB lambda forest, so every later
    placement re-traversed it (~130 ms of driver time per build for the
    minhash kernel, 90% of it py4j waits on JVM analysis; guide §1.2).
    One SQL = one parse + one analyzer pass (~40 ms). The logical plan
    is the same: rank-capped window (InferWindowGroupLimit still fires —
    pinned), one bucket exchange, streaming two-generator pair explode,
    distinct. Results byte-identical (probe + oracle)."""
    key_sql = ", ".join(_q(k) for k in keys)
    qid = _q(id_col)
    sql = f"""
    WITH __banded AS (SELECT {", ".join(banded_select)} FROM {{__docs}}),
    __capped AS (
      SELECT *, row_number() OVER (PARTITION BY {key_sql}
                                   ORDER BY {qid}) AS __rn
      FROM __banded),
    __buckets AS (
      SELECT ids FROM (
        SELECT array_sort(collect_set({qid})) AS ids
        FROM __capped WHERE __rn <= {max_bucket_size + 1}
        GROUP BY {key_sql})
      WHERE size(ids) > 1 AND size(ids) <= {max_bucket_size}),
    __pairs AS (
      SELECT inline(transform(slice(ids, __i + 1, size(ids)),
                    y -> named_struct('id_a', element_at(ids, __i),
                                      'id_b', y)))
      FROM (SELECT ids, explode(if(size(ids) >= 2,
                                   sequence(1, size(ids) - 1),
                                   array())) AS __i
            FROM __buckets))
    SELECT DISTINCT id_a, id_b FROM __pairs
    """
    return docs.sparkSession.sql(sql, __docs=docs)


def pairs_from_buckets(buckets: DataFrame,
                       ids_col: str = "ids") -> DataFrame:
    """Distinct (id_a < id_b) pairs from bucketed id-arrays.

    Shared tail of every banding strategy (MinHash-LSH, SimHash
    pigeonhole, hyperplane-LSH): pair generation happens *inside* each
    bucket with array combinatorics, so no second self-join / shuffle of
    the corpus is needed — only the bucket rows explode.

    TWO chained generators, not one: ``inline(flatten(transform(...)))``
    evaluated the whole b²-struct pair array per bucket row before the
    explode could stream it — ~50M structs (GBs) in one allocation for a
    bucket at the 10k cap (guide §5). Exploding the anchor index first
    keeps every evaluated array O(bucket): each generated row carries
    one slice; the pair stream feeds the distinct's spillable hash
    aggregate row by row. Same pair set (i = size(ids) contributed an
    empty slice before; i stops at size-1 now).
    """
    q = _q(ids_col)
    # the if() guards singleton/empty buckets (sequence(1, size-1)
    # would DESCEND through 0 for them) without a separate filter
    # placement (guide §1.2)
    return (buckets
            .selectExpr(q,
                        f"explode(if(size({q}) >= 2, "
                        f"sequence(1, size({q}) - 1), "
                        f"array())) AS __i")
            .selectExpr(
                f"inline(transform(slice({q}, __i + 1, size({q})), "
                f"y -> named_struct('id_a', element_at({q}, __i), "
                f"'id_b', y)))")
            .distinct())


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest id per exact text content (hash-groupBy).

    Grouping on xxhash64(text) (not the text itself) keeps shuffle rows
    narrow at 100 TB; collision probability 2^-64 per pair is accepted.
    """
    return (docs
            .groupBy(F.xxhash64(F.col(text_col)).alias("content_hash"))
            .agg(F.min(id_col).alias(id_col),
                 F.count(F.lit(1)).alias("dup_count")))


# Input-size threshold for the automatic MinHash kernel choice
# (use_arrow=None). Measured r14 crossover on the declared kernel:
#   sf0.1 (0.6 MB docs): JVM 0.28 s vs Arrow 0.31 s signature pass —
#     a wash, and the JVM kernel is steadier under co-tenant load;
#   sf1 (5.7 MB docs):   JVM 1.60 s vs Arrow 0.69 s (2.3×), full LSH
#     candidates 2.27 → 1.58 s — the per-worker numpy import and Arrow
#     batch setup amortize, and the K×N multiply-mod-min is exactly the
#     shape numpy wins at.
# Between those points the curves cross near a few MB; 4 MiB keeps every
# bench/gate SF on the steady JVM path and every at-scale corpus on the
# vectorized one. Results are bit-equal either way (pinned in
# tests/test_pipeline.py::test_minhash_fused_build_matches_arrow_kernel).
_ARROW_INPUT_THRESHOLD = 4 * 1024 * 1024


def _auto_arrow(docs: DataFrame) -> bool:
    """use_arrow=None resolver: Arrow for inputs past the measured
    crossover, JVM below it (or when the size is unknowable)."""
    try:
        size = int(docs._jdf.queryExecution().optimizedPlan()
                   .stats().sizeInBytes())
    except Exception:
        return False
    if size >= (1 << 60):
        # stats-less relations (parallelized test data, RDD-backed
        # plans) report spark.sql.defaultSizeInBytes = Long.MaxValue —
        # that is "unknown", not "huge": keep the steady JVM kernel
        return False
    return size >= _ARROW_INPUT_THRESHOLD


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       num_hashes: int = 64, shingle_n: int = 3,
                       use_arrow: bool | None = True) -> DataFrame:
    """Append ``signature: array<long>`` — K-permutation MinHash.

    Shingle hashing stays JVM-side; the K-permutation min is a vectorized
    Arrow-batched numpy kernel (measured 2.3× faster than the equivalent
    zip_with/aggregate expression at sf1 — the K×N multiply-mod-min is
    exactly the shape numpy wins at). ``use_arrow=False`` selects the
    pure-JVM expression path; ``None`` picks by input size (see
    ``_ARROW_INPUT_THRESHOLD``). Signatures are bit-equal either way.
    """
    if use_arrow is None:
        use_arrow = _auto_arrow(docs)
    docs = _ensure_parallelism(docs)
    sh = shingles(text_col, shingle_n)
    docs = docs.withColumn("__shingles", sh)
    if use_arrow:
        sig = _minhash_arrow_udf(num_hashes)(F.col("__shingles"))
    else:
        sig = _minhash_jvm_expr(num_hashes)
    return docs.withColumn("signature", sig).drop("__shingles")


def _minhash_arrow_udf(num_hashes: int):
    # imports at closure level keep pipeline importable without pandas;
    # the type hints must be real classes (module uses postponed
    # annotations, so build the hints explicitly via __annotations__)
    import numpy as np
    import pandas as pd

    params = _perm_params(num_hashes)
    sentinel = [int(_MERSENNE)] * num_hashes

    def minhash_np(sh):
        a = np.array([p[0] for p in params], dtype=np.uint64)
        b = np.array([p[1] for p in params], dtype=np.uint64)
        m = np.uint64(_MERSENNE)
        out = []
        for arr in sh:
            if arr is None or len(arr) == 0:
                out.append(sentinel)
                continue
            h = np.asarray(arr, dtype=np.int64).astype(np.uint64)
            with np.errstate(over="ignore"):
                vals = (h[:, None] * a[None, :] + b[None, :]) % m
            out.append([int(v) for v in vals.min(axis=0)])
        return pd.Series(out)

    minhash_np.__annotations__ = {"sh": pd.Series, "return": pd.Series}
    return F.pandas_udf(minhash_np, "array<long>")


def _minhash_sql(shingles_sql: str, num_hashes: int) -> str:
    """SQL-string K-permutation MinHash over a shingle-array expression:
    one aggregate pass, K-wide running-min accumulator merged with
    zip_with (K separate array_min(transform(...)) would traverse the
    array K times and blow up codegen).

    ONE SQL string: the K-struct (a, b) literal array built via
    per-struct ``F.lit``/``F.struct`` calls costs ~400 py4j round trips
    per plan build (~0.35 s of pure driver time per bench pass); the
    string parses JVM-side in one call to the identical Catalyst tree
    (signatures verified bit-equal in tools/probe_r13_opt).
    """
    params = _perm_params(num_hashes)
    ab_sql = "array(" + ",".join(
        f"named_struct('a', {a}L, 'b', {b}L)" for a, b in params) + ")"
    return (
        f"aggregate({shingles_sql}, array_repeat({_MERSENNE}L, {num_hashes}), "
        f"(acc, h) -> zip_with(acc, {ab_sql}, "
        f"(cur, p) -> least(cur, pmod(h * p.a + p.b, {_MERSENNE}L))), "
        "x -> x)")


def _minhash_jvm_expr(num_hashes: int) -> Column:
    """Column form of :func:`_minhash_sql` over a ``__shingles`` column."""
    return F.expr(_minhash_sql("__shingles", num_hashes))


def minhash_lsh_candidates(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", num_hashes: int = 64,
                           bands: int = 16, shingle_n: int = 3,
                           max_bucket_size: int = 10000,
                           use_arrow: bool | None = True) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding.

    Signature split into ``bands`` bands of r = K/bands rows; docs sharing
    any band hash are candidates. Returns distinct (id_a < id_b) pairs.

    Shape at scale: ONE pass computes signatures, ONE shuffle groups
    (band, bucket) → id-list, pairs are generated inside each bucket with
    array combinatorics (a self-join would recompute the signature
    pipeline on both sides and shuffle twice). ``max_bucket_size`` drops
    degenerate buckets (boilerplate-identical shards) whose quadratic
    pair fan-out would dominate — standard LSH-dedup guard at 100 TB.
    """
    if use_arrow is None:
        use_arrow = _auto_arrow(docs)
    r = num_hashes // bands
    # Band bucket = xxhash64 over the band index + the band's r signature
    # longs DIRECTLY (multi-arg xxhash64): casting every signature long
    # to string and concat_ws-joining them paid O(r) string allocations
    # per band per doc just to feed a hash (guide §1.2 per-task work).
    # ``inline`` explodes the band structs straight into (band, bucket)
    # columns in the SAME select — explode-then-project placed the
    # lambda tree into one extra Dataset per build (each placement
    # re-runs the analyzer's fixed point, ~15-60 ms of driver time).
    if use_arrow:
        sigs = minhash_signatures(docs.select(id_col, text_col), text_col,
                                  num_hashes, shingle_n, use_arrow=True)
        args = ", ".join(f"signature[b*{r}+{i}]" for i in range(r))
        banded = sigs.selectExpr(
            _q(id_col),
            f"inline(transform(sequence(0, {bands - 1}), "
            f"b -> named_struct('band', b, 'bucket', xxhash64(b, {args}))))")
    else:
        # Pure-JVM kernel: shingles -> signature -> band structs FUSED
        # into one placement. Chained withColumn/select steps re-ran the
        # analyzer's fixed point over the lambda-heavy subtree at every
        # step (~170 ms per plan build, measured); fused, the tree is
        # analyzed once (~60 ms). The signature subexpression is
        # let-bound (1-element transform) so it is still evaluated ONCE
        # per row; candidate pairs verified identical.
        sig_sql = _minhash_sql(_shingles_sql(_q(text_col), shingle_n),
                               num_hashes)
        args = ", ".join(f"s[b*{r}+{i}]" for i in range(r))
        banded_select = [
            _q(id_col),
            f"inline(element_at(transform(array({sig_sql}), "
            f"s -> transform(sequence(0, {bands - 1}), "
            f"b -> named_struct('band', b, "
            f"'bucket', xxhash64(b, {args})))), 1))"]
        # whole kernel as ONE spark.sql (single analyzer pass over the
        # lambda forest instead of ~10 re-analyses; same plan, r14)
        return _banded_pairs_one_sql(
            _ensure_parallelism(docs.select(id_col, text_col)),
            banded_select, id_col, ("band", "bucket"), max_bucket_size)
    buckets = _bounded_buckets(banded, ("band", "bucket"), id_col,
                               max_bucket_size)
    return pairs_from_buckets(buckets)


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", threshold: float = 0.6,
                        num_hashes: int = 64, bands: int = 16,
                        shingle_n: int = 3,
                        use_arrow: bool | None = True) -> DataFrame:
    """Exact n-gram Jaccard over LSH candidates (verify step).

    LSH prunes to near-linear candidates, then the exact Jaccard is
    array_intersect/array_union on shingle-hash arrays — still JVM-side.
    """
    cands = minhash_lsh_candidates(docs, text_col, id_col, num_hashes,
                                   bands, shingle_n, use_arrow=use_arrow)
    sh = docs.select(F.col(id_col), shingles(text_col, shingle_n).alias("sh"))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    joined = cands.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (joined.select("id_a", "id_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def ngram_jaccard_exact_pairs(docs: DataFrame, text_col: str = "text",
                              id_col: str = "doc_id",
                              threshold: float = 0.6,
                              shingle_n: int = 3) -> DataFrame:
    """Exact word-n-gram Jaccard over ALL pairs — the oracle-able
    baseline (SQL-expressible in DuckDB as string shingles; the hash
    shingles here give identical set sizes barring 64-bit collisions).

    All-pairs is O(n²): VERIFY-ONLY, like ``cosine_near_dup_pairs`` —
    the 100 TB path is ``ngram_jaccard_pairs`` (LSH candidates) above.
    """
    sh = docs.select(F.col(id_col),
                     shingles(text_col, shingle_n).alias("sh")) \
             .filter(F.size("sh") > 0)
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    joined = a.join(b, F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter / union
    return (joined.select("id_a", "id_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def simhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over word hashes, fully JVM-side.

    For each bit position, majority vote of token-hash bits:
    bit_b = 1 iff sum over tokens of (2*bit(h,b) - 1) > 0.
    Expressed as one aggregate over the token-hash array per bit, folded
    into the signature with shiftleft/bitwise-or — no Python, no explode.
    """
    docs = _ensure_parallelism(docs)
    words = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                     lambda w: w != "")
    hashes = F.transform(words, lambda w: F.xxhash64(w))
    docs = docs.withColumn("__h", hashes)

    # ONE aggregate pass building a 64-wide vote vector, then one fold
    # packing sign bits — the previous per-bit spelling ran 64 separate
    # aggregates (64 traversals of the token-hash array per row and a
    # 64x bigger codegen tree). Exactly the same votes/bits (integer
    # ops only); r13 optimization, guide §1.2 per-task work.
    sig = F.expr(
        "aggregate("
        "  zip_with("
        "    aggregate(__h, array_repeat(0L, 64),"
        "      (acc, h) -> zip_with(acc, sequence(0, 63),"
        "        (a, b) -> a + ((h >> b) & 1L) * 2L - 1L),"
        "      x -> x),"
        "    sequence(0, 63),"
        "    (v, b) -> IF(v > 0L, shiftleft(1L, b), 0L)),"
        "  0L, (acc, x) -> acc | x, x -> x)")
    return docs.select(F.col(id_col), sig.alias("simhash"))


def minhash_signatures_md5(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id",
                           num_hashes: int = 16) -> DataFrame:
    """Deterministic MD5-seeded MinHash twin for the DuckDB oracle gate.

    Token set = distinct whitespace words of lower(text); hash i of a
    token = md5(token || ':i') hex; signature element i = lexicographic
    MIN — both engines share the md5 domain byte-for-byte, so a DuckDB
    oracle recomputes the exact signatures (the production path is
    ``minhash_signatures``' K-permutation kernel; this twin pins the
    band/bucket machinery end-to-end). Fully JVM-side.

    The word and shingle arrays are LET-BOUND (1-element ``transform``)
    inside one expression: spelled as chained ``withColumn`` aliases,
    CollapseProject inlined the tokenizer into every one of the K
    ``array_min`` branches — the optimized plan held 81 copies of
    ``split()`` and the 500-doc twin ran 17-24 s (r13; values
    byte-identical, now ~1 s)."""
    docs = _ensure_parallelism(docs)
    return docs.selectExpr(
        _q(id_col),
        f"{_md5_sig_sql(text_col, num_hashes)} AS sig_md5")


def _md5_sig_sql(text_col: str, num_hashes: int) -> str:
    """One let-bound SQL expression for the md5 MinHash signature:
    words -> distinct 3-word string shingles -> K array_min lanes, each
    subexpression evaluated once per row."""
    words = (f"filter(split(lower({_q(text_col)}), '\\\\s+'), "
             "w -> w != '')")
    # sequence(1, m) is DESCENDING for m < 1, so short docs need the
    # explicit empty-array branch (3-word STRING shingles so DuckDB
    # rebuilds them exactly; hashed shingles are the production path)
    sh = ("CASE WHEN size(w) - 2 < 1 THEN CAST(array() AS ARRAY<STRING>) "
          "ELSE array_distinct(transform(sequence(1, size(w) - 2), "
          "i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1), "
          "element_at(w, i + 2)))) END")
    lanes = ", ".join(
        f"array_min(transform(sh, s -> md5(concat(s, ':{i}'))))"
        for i in range(num_hashes))
    return (f"element_at(transform(array("
            f"element_at(transform(array({words}), w -> {sh}), 1)), "
            f"sh -> array({lanes})), 1)")


def minhash_md5_candidates(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", num_hashes: int = 16,
                           bands: int = 4,
                           max_bucket_size: int = 10000) -> DataFrame:
    """LSH banding over the md5 MinHash twin: the SAME one-shuffle
    (band, bucket) → pairs shape as ``minhash_lsh_candidates`` (band
    key = concatenated band rows; ``pairs_from_buckets`` tail), pinned
    against a DuckDB recomputation in the catalog.

    ``max_bucket_size`` (r14) bounds the per-bucket id collection like
    the production kernel — degenerate buckets are dropped instead of
    OOMing one task; no testdata bucket comes near the cap, so the
    oracle-pinned output is unchanged."""
    r = num_hashes // bands
    # ONE fused placement with the signature LET-BOUND (same device as
    # minhash_lsh_candidates): banding as a separate select let
    # CollapseProject inline the whole signature expression into the
    # band lambda (4× per row) and the not-null filter (1× more).
    # Docs with <3 words have no shingles (array_min → NULL): they emit
    # an empty band array, so inline() drops them — exactly the old
    # isNotNull filter, where the oracle produces no signature row.
    banded_select = [
        _q(id_col),
        f"inline(element_at(transform("
        f"array({_md5_sig_sql(text_col, num_hashes)}), "
        f"sig -> CASE WHEN element_at(sig, 1) IS NULL "
        f"THEN CAST(array() AS ARRAY<STRUCT<band: INT, bucket: STRING>>) "
        f"ELSE transform(sequence(0, {bands - 1}), "
        f"b -> named_struct('band', b, "
        f"'bucket', array_join(slice(sig, b*{r}+1, {r}), ''))) "
        f"END), 1))"]
    return _banded_pairs_one_sql(
        _ensure_parallelism(docs.select(id_col, text_col)),
        banded_select, id_col, ("band", "bucket"), max_bucket_size)


def simhash_signatures_md5(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id",
                           nbits: int = 32) -> DataFrame:
    """Deterministic SimHash twin for the DuckDB oracle gate.

    Same bit-vote construction as ``simhash_signatures`` but token-hash
    bits come from md5 hex nibbles (bit b of a token = bit b%4 of hex
    digit b//4) — md5 is available in both engines, so the oracle can
    recompute the exact signature in SQL. Still fully JVM-side
    (split/transform/aggregate HOFs, no Python)."""
    docs = _ensure_parallelism(docs)
    words = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                     lambda w: w != "")
    hashes = F.transform(words, lambda w: F.md5(w))
    docs = docs.withColumn("__h", hashes)

    # ONE aggregate pass over the token hashes building the nbits-wide
    # vote vector (was nbits separate aggregates — nbits traversals per
    # row); bit b of a token = bit b%4 of hex digit b//4, exactly as
    # before, so signatures (and the DuckDB oracle match) are unchanged.
    sig = F.expr(
        "aggregate("
        "  zip_with("
        f"    aggregate(__h, array_repeat(0L, {nbits}),"
        f"      (acc, h) -> zip_with(acc, sequence(0, {nbits - 1}),"
        "        (a, b) -> a + ("
        "          (shiftright(cast(conv(substring("
        "             h, cast(b div 4 as int) + 1, 1), 16, 10) as int),"
        "            cast(b % 4 as int)) & 1) * 2L - 1L)),"
        "      x -> x),"
        f"    sequence(0, {nbits - 1}),"
        "    (v, b) -> IF(v > 0L, shiftleft(1L, b), 0L)),"
        "  0L, (acc, x) -> acc | x, x -> x)")
    return docs.select(F.col(id_col), sig.alias("simhash"))


def simhash_hamming_pairs(sigs: DataFrame, k: int = 3,
                          id_col: str = "doc_id",
                          sig_col: str = "simhash",
                          max_bucket_size: int = 10000,
                          nbits: int = 64) -> DataFrame:
    """(id_a, id_b, hamming) pairs with hamming(sig_a, sig_b) <= k.

    Pigeonhole banding: split 64 bits into k+1 chunks — any pair within
    hamming k agrees exactly on at least one chunk, so grouping by
    (chunk_idx, chunk_value) finds every true pair without an all-pairs
    join. Candidates are generated inside buckets (one shuffle, bounded
    by ``max_bucket_size``), then verified exactly with
    bit_count(xor) <= k. Same shuffle shape as MinHash-LSH banding —
    the only strategy that survives 100 TB.
    """
    bands = k + 1
    base, extra = divmod(nbits, bands)
    widths = [base + (1 if i < extra else 0) for i in range(bands)]
    starts = [sum(widths[:i]) for i in range(bands)]
    chunks = F.array(*[
        F.struct(
            F.lit(i).alias("band"),
            F.shiftrightunsigned(F.col(sig_col), starts[i])
             .bitwiseAND(F.lit((1 << widths[i]) - 1)).alias("val"))
        for i in range(bands)])
    banded = (sigs.select(id_col, F.explode(chunks).alias("bk"))
              .select(id_col, F.col("bk.band").alias("band"),
                      F.col("bk.val").alias("val")))
    buckets = _bounded_buckets(banded, ("band", "val"), id_col,
                               max_bucket_size)
    cands = pairs_from_buckets(buckets)
    a = sigs.select(F.col(id_col).alias("id_a"), F.col(sig_col).alias("__sa"))
    b = sigs.select(F.col(id_col).alias("id_b"), F.col(sig_col).alias("__sb"))
    ham = F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb")))
    return (cands.join(a, "id_a").join(b, "id_b")
            .select("id_a", "id_b", ham.alias("hamming"))
            .filter(F.col("hamming") <= k))


def simhash_near_dups_hamming(docs: DataFrame, text_col: str = "text",
                              id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Near-dup doc pairs within SimHash hamming distance k (banded)."""
    sigs = simhash_signatures(docs, text_col, id_col)
    return simhash_hamming_pairs(sigs, k, id_col)


def simhash_near_dups(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Docs sharing an identical SimHash (strong near-dup signal).

    Hamming-distance-k banding (split 64 bits into k+1 chunks, join per
    chunk) generalizes this; identical-signature grouping is the k=0 case.
    """
    sigs = simhash_signatures(docs, text_col, id_col)
    return (sigs.groupBy("simhash")
                .agg(F.count(F.lit(1)).alias("n_docs"),
                     F.min(id_col).alias("keep_id"))
                .filter(F.col("n_docs") > 1))


def connected_components(pairs: DataFrame, max_iter: int = 20,
                         a_col: str = "id_a",
                         b_col: str = "id_b",
                         _stats: dict | None = None) -> DataFrame:
    """Group candidate pairs into duplicate clusters: (id, component).

    The step after LSH/SimHash banding in a real dedup pipeline —
    near-dup similarity is not transitive, so pairs must be closed into
    components before one representative per cluster can be kept.

    Algorithm: min-label propagation with pointer jumping. Each round
    does (1) one hop — every node takes the min label over itself and
    its neighbors (hash join on the edge key) — and (2) path
    compression — every node re-reads its label's label (self join on
    the label). Compression doubles the propagation distance per round,
    so convergence is O(log diameter) joins (the pointer-doubling idea
    behind the "large-star/small-star" MapReduce CC family), and
    ``max_iter=20`` covers ~2^20-long chains. The loop exits via a
    cheap changed-row check; at the bound we raise rather than return
    wrong groups.
    """
    # repartition("src") BEFORE the checkpoint: localCheckpoint keeps
    # the physical hashpartitioning, so the per-round hop join never
    # re-shuffles the (constant, largest) edge table again — only the
    # labels side moves each round (guide §2.4). The distinct keys on
    # (src, dst), which does NOT satisfy the join's src distribution,
    # so without this every round re-shuffled all 2|E| edge rows.
    edges = (pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
             .union(pairs.select(F.col(b_col).alias("src"),
                                 F.col(a_col).alias("dst")))
             .distinct()
             .repartition("src")
             .localCheckpoint(eager=True))
    # localCheckpoint after every round: iterative self-joins otherwise
    # stack each round's plan inside the next (analysis blows up
    # exponentially even with persist, which caches data but not
    # lineage). On a real cluster with flaky executors, swap for
    # spark.sparkContext.setCheckpointDir + .checkpoint() — same shape.
    labels = (edges.select(F.col("src").alias("id")).distinct()
              .withColumn("comp", F.col("id"))
              .localCheckpoint(eager=True))
    for _round in range(max_iter):
        # (1) one-hop: for each dst, min label among its neighbors
        nbr = (edges.join(labels.withColumnRenamed("id", "src"), "src")
               .groupBy("dst").agg(F.min("comp").alias("nbr_comp"))
               .withColumnRenamed("dst", "id"))
        # the pre-round label rides along as __old so convergence can be
        # read off the checkpointed frame with one local scan — the
        # previous labels-join-new_labels changed check re-shuffled both
        # sides every round (r13; label sequence identical)
        hop = (labels.join(nbr, "id", "left")
               .select("id", F.col("comp").alias("__old"),
                       F.least("comp", "nbr_comp").alias("comp")))
        # (2) pointer jumping: comp <- label(comp), halving path lengths
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
                _stats["rounds"] = _round + 1
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        f"(graph diameter too large — raise max_iter)")


def dedup_keep_canonical(docs: DataFrame, pairs: DataFrame,
                         id_col: str = "doc_id") -> DataFrame:
    """Drop every document in a near-dup cluster except its min-id
    representative: docs -> docs without non-canonical members.

    One CC pass plus an anti join — the standard tail of an LSH dedup
    pipeline (candidates -> verify -> group -> keep one)."""
    comps = connected_components(pairs)
    losers = comps.filter(F.col("id") != F.col("comp")) \
                  .select(F.col("id").alias(id_col))
    return docs.join(losers, id_col, "left_anti")


# --- cross-document passage dedup (RefinedWeb / CCNet line-dedup shape) -----

def unit_dedup(docs: DataFrame, units: Column, id_col: str = "doc_id",
               max_count: int = 1, join_sep: str = " ") -> DataFrame:
    """Remove every unit (line / passage / chunk) whose corpus-wide
    occurrence count exceeds ``max_count``, preserving the remaining
    units in document order.

    The public line-dedup recipe (CCNet, RefinedWeb): repeated
    boilerplate lines are removed from EVERY document once they occur in
    more than ``max_count`` places corpus-wide. Distributed shape:
    posexplode -> count per unit hash (one shuffle, map-side combine) ->
    hash-join counts back (co-partitioned on the same key, AQE-planned)
    -> per-doc rebuild (one shuffle). No collect, no per-doc Python; at
    100 TB every stage keys on uniformly-distributed xxhash64 values.

    Returns one row per input document: (id_col, kept_text, n_units,
    n_removed) — documents whose every unit was removed stay present
    with an empty kept_text.
    """
    exploded = docs.select(
        F.col(id_col),
        F.posexplode_outer(units).alias("__pos", "__unit"))
    exploded = exploded.withColumn("__h", F.xxhash64("__unit"))
    counts = exploded.groupBy("__h").agg(F.count("*").alias("__n"))
    flagged = (exploded.join(counts, "__h")
               .select(id_col, "__pos", "__unit",
                       (F.col("__n") <= max_count).alias("__keep")))
    rebuilt = F.array_join(
        F.transform(
            F.filter(F.sort_array(F.collect_list(
                F.struct("__pos", "__unit", "__keep"))),
                lambda x: x["__keep"] & x["__pos"].isNotNull()),
            lambda x: x["__unit"]),
        join_sep)
    kept = F.sum(F.when(F.col("__keep") & F.col("__pos").isNotNull(), 1)
                 .otherwise(0))
    removed = F.sum(F.when(~F.col("__keep"), 1).otherwise(0))
    return (flagged.groupBy(id_col)
            .agg(rebuilt.alias("kept_text"),
                 kept.cast("long").alias("n_units"),
                 removed.cast("long").alias("n_removed")))


def word_chunks(text: Column, k: int = 8) -> Column:
    """Split text into consecutive k-word passages (last one partial) —
    the dedup unit for corpora without line structure.

    Tokens are let-bound (1-element ``transform``) so the split runs
    ONCE per row — referenced inside the per-chunk slice lambda it
    would re-tokenize per chunk (lambda copies defeat Catalyst CSE)."""
    toks_expr = F.filter(F.split(text, r"\s+"), lambda w: w != "")

    def from_toks(toks: Column) -> Column:
        n_chunks = F.ceil(F.size(toks) / F.lit(float(k))).cast("int")
        return F.when(n_chunks > 0, F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(F.slice(toks, i * k + 1, k), " "))
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(toks_expr), from_toks), 1)


def passage_dedup(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", words_per_chunk: int = 8,
                  max_count: int = 1) -> DataFrame:
    """Cross-document exact passage dedup: chunk every document into
    k-word passages and drop passages occurring more than ``max_count``
    times corpus-wide (C4-style substring dedup at passage granularity)."""
    return unit_dedup(docs, word_chunks(F.col(text_col), words_per_chunk),
                      id_col=id_col, max_count=max_count, join_sep=" ")
