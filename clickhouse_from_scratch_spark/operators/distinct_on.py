"""DISTINCT ON (exprs) — first row per key.

Reference: parse-time rewrite DISTINCT ON → LIMIT 1 BY
(``src/Parsers/ParserSelectQuery.cpp:363-372``). We reproduce the same
rewrite: it *is* ``limit_by(n=1)``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame

from .limit_by import limit_by


def distinct_on(df: DataFrame, keys: Sequence[str | Column],
                order: Sequence[Column]) -> DataFrame:
    """First row per ``keys`` under ``order`` (deterministic DISTINCT ON)."""
    return limit_by(df, keys, order, n=1)
