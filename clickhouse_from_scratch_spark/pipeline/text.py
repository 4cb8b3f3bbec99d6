"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting.

All JVM-side (built-in functions only) so they run inside whole-stage
codegen over 100 TB of documents — these are per-row maps with zero
shuffle; every one of them is oracle-expressible in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic marker-word lists per language (public stopwords).
# A real system ships trained n-gram profiles; the *plumbing* (per-row
# scoring, argmax over languages) is identical.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "nicht", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "de", "que", "los", "una"],
    "zh": ["的", "是", "了", "在", "我"],
}


def _tokens(text: Column | str) -> Column:
    # string arg (column name) → ONE F.expr (single py4j call) instead
    # of the ~6-call HOF composition; same tree (guide §1.2 — plan
    # build is inside the bench's timed region)
    if isinstance(text, str):
        from .dedup import _q
        return F.expr(
            f"filter(split(lower({_q(text)}), '\\\\s+'), w -> w <> '')")
    return F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")


def token_count(text: Column) -> Column:
    """Whitespace token count (the BPE-ish regex variant is
    ``token_count_bpe`` below)."""
    return F.size(_tokens(text))


def token_count_bpe(text: Column) -> Column:
    """Tokens under a BPE-ish pre-tokenizer regex: word pieces, numbers,
    and punctuation runs counted separately (GPT-2-style pre-split)."""
    pieces = F.regexp_extract_all(
        text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"), F.lit(0))
    return F.size(pieces)


def lang_score(text: Column, lang: str,
               tokens: Column | None = None) -> Column:
    """Marker-word hit count for one language (rate per token).

    Pass a pre-materialized ``tokens`` projection to skip re-tokenizing
    (see ``quality_score``); values are identical either way."""
    toks = _tokens(text) if tokens is None else tokens
    markers = LANG_MARKERS[lang]
    hits = F.size(F.filter(toks, lambda w: w.isin(markers)))
    return hits


def language_id(text: Column, tokens: Column | None = None) -> Column:
    """Argmax language over marker-word hit counts; 'und' if all zero.

    Inlined, every language's score re-tokenizes the document (5 regex
    splits per row — Catalyst cannot CSE lambda-bearing copies); pass a
    pre-materialized ``tokens`` projection to tokenize once per row
    (guide §1.2 per-task work). Same values either way.
    """
    out = F.lit("und")
    best = F.lit(0)
    # fold left→right: later languages win ties only if strictly better,
    # so iteration order (dict order, fixed) makes this deterministic
    for lang in LANG_MARKERS:
        s = lang_score(text, lang, tokens=tokens)
        out = F.when(s > best, F.lit(lang)).otherwise(out)
        best = F.greatest(best, s)
    return out


def quality_score(text: Column, tokens: Column | None = None) -> Column:
    """Heuristic quality in [0,1]: length band + punctuation ratio +
    stopword presence (C4-style filters, simplified and deterministic).

    Pass a pre-materialized ``tokens`` column (``_tokens(text)`` as a
    real projection) to tokenize once per row — inlined, the regex split
    runs twice here (token count + stopword filter) and a third time in
    any sibling ``token_count`` projection, and Catalyst cannot CSE the
    copies (each occurrence resolves fresh lambda ids). Same values
    either way (guide §1.2 per-task work).
    """
    n = F.length(text)
    toks_arr = _tokens(text) if tokens is None else tokens
    toks = F.size(toks_arr)
    # crude per-component indicators, each 0/1, averaged
    len_ok = F.when((n >= 50) & (n <= 20000), 1.0).otherwise(0.0)
    tok_ok = F.when(toks >= 10, 1.0).otherwise(0.0)
    punct = F.length(F.regexp_replace(text, r"[^!?.,;:]", ""))
    punct_ratio = F.when(n > 0, punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio <= 0.2, 1.0).otherwise(0.0)
    stop_hits = F.size(F.filter(toks_arr,
                                lambda w: w.isin(LANG_MARKERS["en"])))
    stop_ok = F.when(stop_hits >= 1, 1.0).otherwise(0.0)
    return (len_ok + tok_ok + punct_ok + stop_ok) / 4.0


def doc_fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of whitespace-normalized lowercase text.

    Normalization makes trivially-reformatted copies collide; md5 keeps
    the oracle portable (DuckDB md5 = Spark md5).
    """
    norm = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    return F.md5(norm)


# --- repetition signals (Gopher-style quality rules) ------------------------
#
# Rae et al. 2021 ("Scaling Language Models: ... Gopher", public) filter
# documents by repetition: fraction of duplicate lines/words and the
# fraction of characters covered by the most frequent n-gram. The
# per-document fractions are pure JVM column expressions (zero shuffle);
# the top-n-gram signal needs a (doc, gram) aggregation — one shuffle
# with map-side combine, the correct 100 TB shape (never a per-doc
# Python loop).

def dup_unit_fraction(units: Column) -> Column:
    """Fraction of units (words/lines) that repeat an earlier unit:
    1 - distinct/total. 0.0 for empty input."""
    n = F.size(units)
    return F.when(n > 0,
                  1.0 - F.size(F.array_distinct(units)).cast("double")
                  / n.cast("double")).otherwise(F.lit(0.0))


def dup_unit_char_fraction(units: Column) -> Column:
    """Fraction of characters inside duplicate units: (total chars -
    distinct-unit chars) / total chars. 0.0 when no characters."""
    def chars(arr: Column) -> Column:
        return F.aggregate(arr, F.lit(0).cast("long"),
                           lambda acc, u: acc + F.length(u))
    total = chars(units)
    return F.when(total > 0,
                  (total - chars(F.array_distinct(units))).cast("double")
                  / total.cast("double")).otherwise(F.lit(0.0))


def word_ngrams(text: Column, n: int) -> Column:
    """Space-joined word n-grams of the whitespace tokens.

    The token array is let-bound via a 1-element ``transform`` so the
    regex split runs ONCE per row: referencing the tokens expression in
    ``size`` AND inside the per-index lambda would re-evaluate it per
    n-gram (lambda-bearing copies defeat Catalyst CSE; guide §1.2).
    """
    def from_toks(toks: Column) -> Column:
        k = F.size(toks) - (n - 1)
        return F.when(k > 0, F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(_tokens(text)), from_toks), 1)


def top_ngram_char_fraction(df, id_col: str, text_col: str,
                            n: int = 2) -> "DataFrame":
    """Fraction of characters covered by the document's most frequent
    word n-gram: max(count * gram_chars) / total_chars. Distributed as
    explode → (doc, gram) count → per-doc max — two partial-aggregated
    shuffles on uniformly-hashed keys."""
    grams = df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("__chars"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("__gram"))
    per_gram = grams.groupBy(id_col, "__chars", "__gram").count()
    covered = F.max(F.col("count") * F.length("__gram"))
    return (per_gram.groupBy(id_col, "__chars").agg(covered.alias("__cov"))
            .select(F.col(id_col),
                    F.when(F.col("__chars") > 0,
                           F.col("__cov").cast("double")
                           / F.col("__chars").cast("double"))
                    .otherwise(F.lit(0.0)).alias(f"top{n}gram_char_frac")))


# --- PII scrubbing ----------------------------------------------------------
#
# Standard training-data hygiene pass (public C4/CCNet-style pipelines):
# replace emails, IPv4 addresses, and phone-like digit runs with typed
# placeholders. Patterns are RE2-compatible (no lookaround) so the exact
# same regex runs on Spark (Java regex) and the DuckDB oracle. Order
# matters: emails first (contain dots + digits), then IPv4, then the
# greedy phone pattern — each later pattern cannot match inside an
# earlier placeholder.

PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\-\s]{7,}\d", "<PHONE>"),
]


def pii_count(text: Column, kind: str) -> Column:
    """Occurrences of one PII pattern (count BEFORE scrubbing)."""
    pat = next(p for k, p, _ in PII_PATTERNS if k == kind)
    return F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))


def pii_scrub(text: Column) -> Column:
    """Text with every PII pattern replaced by its placeholder."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


# --- TF-IDF term scoring ------------------------------------------------
#
# Standard corpus-level relevance scoring for training-data pipelines
# (select documents by topical terms, build keyword indexes). Fully
# distributed: one (doc, term) aggregation, one term-level document-
# frequency aggregation (map-side combined), one broadcast-friendly
# join back — no driver materialization, uniform hash keys at 100 TB.


def tfidf_top_terms(df, id_col: str, text_col: str, k: int = 3,
                    min_token_len: int = 4) -> "DataFrame":
    """Top-k terms per document by smoothed TF-IDF.

    tf = term count in doc / doc token count;
    idf = ln((N + 1) / (df_t + 1)) + 1 (sklearn-style smoothing —
    deterministic, no zero division); ties break lexicographically.
    Tokens shorter than ``min_token_len`` are dropped (stopword-ish
    filter that keeps the oracle SQL-expressible)."""
    from .dedup import _ensure_parallelism
    df = _ensure_parallelism(df)
    toks = df.select(
        F.col(id_col),
        F.explode(F.filter(_tokens(text_col),
                           lambda w: F.length(w) >= min_token_len))
        .alias("__term"))
    per_doc = toks.groupBy(id_col, "__term").agg(
        F.count(F.lit(1)).alias("__tc"))
    doc_len = per_doc.groupBy(id_col).agg(F.sum("__tc").alias("__dl"))
    # N as a broadcast 1-row frame, not an eager .count(): the count was
    # a full extra corpus pass executed at PLAN BUILD time (before any
    # action); as a cross-joined scalar it runs inside the same job.
    # (N+1)/(df+1) on a long N is the same double division as the old
    # float literal — identical idf values.
    n_docs_df = df.select(F.col(id_col)).distinct().agg(
        F.count(F.lit(1)).alias("__n"))
    idf = per_doc.groupBy("__term").agg(
        F.count_distinct(F.col(id_col)).alias("__df"))
    idf = idf.crossJoin(F.broadcast(n_docs_df)).select(
        "__term",
        (F.log((F.col("__n") + 1) / (F.col("__df") + 1)) + 1.0)
        .alias("__idf"))
    scored = (per_doc
              .join(doc_len, id_col)
              .join(F.broadcast(idf), "__term")
              .select(F.col(id_col), F.col("__term"),
                      F.round((F.col("__tc") / F.col("__dl"))
                              * F.col("__idf"), 8).alias("__score")))
    from pyspark.sql import Window
    w = Window.partitionBy(id_col).orderBy(F.col("__score").desc(),
                                           F.col("__term"))
    return (scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .groupBy(id_col)
            .agg(F.array_join(F.transform(F.array_sort(F.collect_list(
                F.struct(F.col("__rn").alias("r"),
                         F.col("__term").alias("t")))),
                lambda s: s["t"]), ",").alias("top_terms")))


def chunk_documents(df, id_col: str, text_col: str,
                    chunk_tokens: int = 64,
                    overlap: int = 16) -> "DataFrame":
    """Split documents into fixed-token-count chunks with overlap —
    the standard context-window preprocessing for training/embedding
    pipelines. Chunk k covers tokens [k*stride, k*stride+chunk_tokens)
    with stride = chunk_tokens - overlap; the final partial chunk is
    kept. Pure JVM expressions (split → sequence over starts →
    slice/join → posexplode); one narrow pass, no shuffle."""
    if overlap >= chunk_tokens:
        raise ValueError("chunk_documents: overlap must be smaller "
                         "than chunk_tokens")
    from .dedup import _ensure_parallelism
    df = _ensure_parallelism(df)
    stride = chunk_tokens - overlap
    # tokens as a REAL projection: referencing the tokenizer expression
    # inside the per-chunk slice lambda would re-run the regex split for
    # EVERY chunk of every row (lambda copies defeat Catalyst CSE);
    # projected once, the lambda reads a bound column (guide §1.2)
    toks = F.col("__toks")
    n = F.size(toks)
    # number of chunks: ceil(max(n - overlap, 1) / stride), at least 1
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)).cast("double") / stride).cast("int"),
        F.lit(1))
    starts = F.sequence(F.lit(0), (n_chunks - 1) * stride, F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.array_join(F.slice(toks, s + 1, chunk_tokens), " "))
    return (df.withColumn("__toks", _tokens(text_col))
            .select(F.col(id_col), F.posexplode(chunks)
                    .alias("chunk_idx", "chunk_text"))
            .filter(F.col("chunk_text") != ""))
