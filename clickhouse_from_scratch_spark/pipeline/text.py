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


def _tokens(text: Column) -> Column:
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


def lang_score(text: Column, lang: str) -> Column:
    """Marker-word hit count for one language (rate per token)."""
    toks = _tokens(text)
    markers = LANG_MARKERS[lang]
    hits = F.size(F.filter(toks, lambda w: w.isin(markers)))
    return hits


def language_id(text: Column) -> Column:
    """Argmax language over marker-word hit counts; 'und' if all zero."""
    out = F.lit("und")
    best = F.lit(0)
    # fold left→right: later languages win ties only if strictly better,
    # so iteration order (dict order, fixed) makes this deterministic
    for lang in LANG_MARKERS:
        s = lang_score(text, lang)
        out = F.when(s > best, F.lit(lang)).otherwise(out)
        best = F.greatest(best, s)
    return out


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: length band + punctuation ratio +
    stopword presence (C4-style filters, simplified and deterministic)."""
    n = F.length(text)
    toks = token_count(text)
    # crude per-component indicators, each 0/1, averaged
    len_ok = F.when((n >= 50) & (n <= 20000), 1.0).otherwise(0.0)
    tok_ok = F.when(toks >= 10, 1.0).otherwise(0.0)
    punct = F.length(F.regexp_replace(text, r"[^!?.,;:]", ""))
    punct_ratio = F.when(n > 0, punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio <= 0.2, 1.0).otherwise(0.0)
    stop_hits = F.size(F.filter(_tokens(text),
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
