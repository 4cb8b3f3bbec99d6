"""SAMPLE k [OFFSET m] — deterministic sampling on a sampling key.

Reference: ``src/Parsers/ParserTablesInSelectQuery.cpp:34-48``,
``ParserSampleRatio.cpp``. ClickHouse SAMPLE is *deterministic*: the table
declares ``SAMPLE BY <key>`` and ``SAMPLE 0.1`` reads the rows whose hashed
key falls in the first 10% of the hash space — repeatable across queries,
unlike Bernoulli sampling.

Lowering: hash-range predicate on the sampling key. Pure filter — pushes
into the scan where the format supports it, costs no shuffle, and two
queries with the same ratio see the *same* rows (CH's consistency
guarantee for sampled JOINs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_SPACE = 1 << 32


def sample_by_key(df: DataFrame, key: str | Column, fraction: float,
                  offset: float = 0.0) -> DataFrame:
    """Deterministic SAMPLE fraction [OFFSET offset] on ``key``.

    Uses xxhash64(key) mapped into [0, 2^32) — the analogue of CH's
    intHash32 sampling domain.
    """
    kcol = F.col(key) if isinstance(key, str) else key
    h = F.pmod(F.xxhash64(kcol), F.lit(_HASH_SPACE))
    lo = int(offset * _HASH_SPACE)
    hi = int((offset + fraction) * _HASH_SPACE)
    return df.filter((h >= lo) & (h < hi))


def sample_rows(df: DataFrame, n: int, key: str | Column) -> DataFrame:
    """SAMPLE <row-count> form: deterministic top-n by key hash.

    CH estimates a fraction from table stats; we take the n smallest hash
    values (deterministic, stable under re-query).
    """
    kcol = F.col(key) if isinstance(key, str) else key
    return (df.withColumn("__h", F.xxhash64(kcol))
              .orderBy("__h").limit(n).drop("__h"))
